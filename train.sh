# Training recipes (parity with the reference train.sh, adapted to this CLI).

# ---- base model: chairs -> things ------------------------------------------
python train.py ckpts/raft_baseline/chairs --stage chairs --iters 12 \
  --image_size 368 496 --num_steps 100000 --val_step 5000 --lr 4e-4 \
  --weight_decay 1e-4 --batch_size 10

python train.py ckpts/raft_baseline/things --stage things \
  --pretrained_ckpt ckpts/raft_baseline/chairs --image_size 400 720 --iters 12 \
  --num_steps 100000 --val_step 5000 --lr 1.25e-4 --weight_decay 1e-4 \
  --batch_size 6

# ---- semi (flow supervisor): sintel ----------------------------------------
python train.py ckpts/semi/sintel --stage semi-sintel_unsup_test-things_unsup \
  --model_type raft-semi --pretrained_ckpt ckpts/raft_baseline/things \
  --unsup_weight 1.0 --unsup_image_size 368 768 --image_size 400 720 \
  --full_size 432 1024 --iters 12 --num_steps 100000 --val_step 5000 \
  --lr 1e-5 --lr_schedule exponential --lr_decay_steps 25000 --weight_decay 0.0 \
  --batch_size 1 --lfr_weight 1.0 --lfl_weight 1.0 --lfr_loss_type robust \
  --lfl_loss_decay_rate 1.0

# ---- semi: kitti (with teacher SMURF loss, brox occlusion) ------------------
python train.py ckpts/semi/kitti2 --stage semi-kitti_unsup_test-things_unsup \
  --model_type raft-semi --pretrained_ckpt ckpts/raft_baseline/things \
  --unsup_weight 1.0 --unsup_image_size 288 640 --image_size 360 640 \
  --full_size 368 1240 --iters 12 --num_steps 100000 --val_step 5000 \
  --lr 1e-5 --lr_schedule exponential --lr_decay_steps 25000 --weight_decay 0.0 \
  --batch_size 1 --lfr_weight 1.0 --lfl_weight 1.0 \
  --teacher_smurf_weight 1.0 --census_weight 1.0 --smooth2_weight 2.0 \
  --smooth1_weight 0.0 --occlusion brox --lfr_loss_type robust \
  --lfl_loss_decay_rate 0.8

# ---- semi: kitti (no teacher SMURF, wang occlusion) -------------------------
python train.py ckpts/semi/kitti --stage semi-kitti_unsup_test-things_unsup \
  --model_type raft-semi --pretrained_ckpt ckpts/raft_baseline/things \
  --unsup_weight 1.0 --unsup_image_size 288 640 --image_size 360 640 \
  --full_size 368 1240 --iters 12 --num_steps 100000 --val_step 5000 \
  --lr 1e-5 --lr_schedule exponential --lr_decay_steps 25000 --weight_decay 0.0 \
  --batch_size 1 --lfr_weight 1.0 --lfl_weight 1.0 \
  --teacher_smurf_weight 0.0 --census_weight 1.0 --smooth2_weight 2.0 \
  --smooth1_weight 0.0 --occlusion wang --lfr_loss_type robust \
  --lfl_loss_decay_rate 0.8

# ---- semi: DAVIS unlabeled + mixed C+T+S+K+H supervised (GMA variant) -------
python train.py ckpts/semi/davis_ctskh --stage semi-davis_unsup-ctskh \
  --model_type gma-semi --pretrained_ckpt ckpts/raft_baseline/things \
  --unsup_weight 1.0 --unsup_image_size 368 768 --image_size 368 768 \
  --full_size 432 856 --iters 12 --num_steps 100000 --val_step 5000 \
  --lr 1e-5 --lr_schedule exponential --lr_decay_steps 25000 --weight_decay 0.0 \
  --batch_size 1 --lfr_weight 1.0 --lfl_weight 1.0 --lfr_loss_type robust \
  --lfl_loss_decay_rate 0.8
