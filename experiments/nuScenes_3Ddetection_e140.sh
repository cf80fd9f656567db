python -m centertrack_tpu.cli.main ddd --exp_id nuScenes_3Ddetection_e140 \
  --dataset nuscenes --num_epochs 140 --lr_step 90,120 \
  --save_point 90,120 --batch_size 64 --num_devices 4 --lr 2.5e-4 \
  --compute_dtype bfloat16 --dla_node dcn_local
python -m centertrack_tpu.cli.test ddd --exp_id nuScenes_3Ddetection_e140 \
  --dataset nuscenes --resume
