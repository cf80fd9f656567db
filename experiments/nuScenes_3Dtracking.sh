python -m centertrack_tpu.cli.main tracking,ddd --exp_id nuScenes_3Dtracking \
  --dataset nuscenes --pre_hm --shift 0.01 --scale 0.05 \
  --lost_disturb 0.4 --fp_disturb 0.1 --hm_disturb 0.05 \
  --batch_size 64 --num_devices 4 --lr 2.5e-4 --save_point 60 \
  --compute_dtype bfloat16 --dla_node dcn_local \
  --load_model ../models/nuScenes_3Ddetection_e140.ckpt
python -m centertrack_tpu.cli.test tracking,ddd --exp_id nuScenes_3Dtracking \
  --dataset nuscenes --pre_hm --track_thresh 0.1 --resume
