python -m centertrack_tpu.cli.main tracking --exp_id crowdhuman \
  --dataset crowdhuman --ltrb_amodal --pre_hm --shift 0.05 --scale 0.05 \
  --hm_disturb 0.05 --lost_disturb 0.4 --fp_disturb 0.1 \
  --num_epochs 140 --lr_step 90,120 --save_point 60,90 \
  --batch_size 64 --num_devices 4 --lr 2.5e-4 \
  --compute_dtype bfloat16 --dla_node dcn_local
