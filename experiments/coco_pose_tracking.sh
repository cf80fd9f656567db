python -m centertrack_tpu.cli.main tracking,multi_pose --exp_id coco_pose_tracking \
  --dataset coco_hp --load_model ../models/multi_pose_dla_3x.ckpt \
  --batch_size 128 --num_devices 8 --lr 5e-4 --num_workers 16 \
  --process_workers --pre_hm --shift 0.05 --scale 0.05 \
  --hm_disturb 0.05 --lost_disturb 0.4 --fp_disturb 0.1 \
  --compute_dtype bfloat16 --dla_node dcn_local
