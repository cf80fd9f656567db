python -m centertrack_tpu.cli.main tracking --exp_id mot17_fulltrain --dataset mot \
  --dataset_version 17trainval --pre_hm --ltrb_amodal --same_aug_pre \
  --hm_disturb 0.05 --lost_disturb 0.4 --fp_disturb 0.1 \
  --num_devices 2 --compute_dtype bfloat16 --dla_node dcn_local \
  --load_model ../models/crowdhuman.ckpt
python -m centertrack_tpu.cli.test tracking --exp_id mot17_fulltrain --dataset mot \
  --dataset_version 17test --pre_hm --ltrb_amodal \
  --track_thresh 0.4 --pre_thresh 0.5 --resume
