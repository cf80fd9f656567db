python -m centertrack_tpu.cli.main tracking --exp_id kitti_fulltrain \
  --dataset kitti_tracking --dataset_version train --pre_hm --same_aug_pre \
  --hm_disturb 0.05 --lost_disturb 0.2 --fp_disturb 0.1 \
  --batch_size 16 --num_devices 2 --compute_dtype bfloat16 --dla_node dcn_local \
  --load_model ../models/nuScenes_3Ddetection_e140.ckpt
python -m centertrack_tpu.cli.test tracking --exp_id kitti_fulltrain \
  --dataset kitti_tracking --dataset_version test --pre_hm \
  --track_thresh 0.4 --resume
