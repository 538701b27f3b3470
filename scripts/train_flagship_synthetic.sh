#!/bin/bash
# Two-stage flagship training on synthetic phantoms @256^2 (real TPU):
# RecNet pretrain -> adversarial refinement -> deploy. Produces a trained
# generator checkpoint for quality studies (scripts/quality_dtype_table.py
# --checkpoint). Shorter than the round-2 49-min quality run; tune epochs
# via env RECNET_EPOCHS / REFINE_EPOCHS.
set -e
cd "$(dirname "$0")/.."
LOG_DIR=${LOG_DIR:-/tmp/flagship_runs}
RECNET_EPOCHS=${RECNET_EPOCHS:-20}
REFINE_EPOCHS=${REFINE_EPOCHS:-8}
rm -rf "$LOG_DIR"; mkdir -p "$LOG_DIR"

python - <<EOF
import json
conf = {
  'seed': 0, 'run_name': 'recnet-pre',
  'train_dataset': 'Synthetic', 'validation_dataset': 'Synthetic',
  'synthetic': {'image_size': 256, 'num_train': 256, 'num_val': 16},
  'undersampling': {'sampling_scheme': 'varden', 'acceleration_factor': 8,
                    'variable_acceleration': False},
  'runner_type': 'standard', 'application': 'reconstruction',
  'model': {'name': 'RecNet', 'num_blocks': 3, 'num_convs': 3,
            'num_filters': 32},
  'loss_name': 'MSE',
  'optimizer': {'name': 'Adam', 'learning_rate': 0.0002},
  'num_epochs': $RECNET_EPOCHS, 'batch_size': 16,
  'epochs_per_validation': $RECNET_EPOCHS,
  'epochs_per_checkpoint': $RECNET_EPOCHS,
  'use_tensorboard': False, 'num_image_summaries': 0,
  'num_data_workers': 0,
}
json.dump(conf, open('$LOG_DIR/recnet-pre.json', 'w'))
EOF
python train.py "$LOG_DIR/recnet-pre.json" --log-dir "$LOG_DIR"
RECNET_CKPT=$(ls "$LOG_DIR"/recnet-pre_*/periodic-chkpt_*.ckpt | tail -1)
echo "recnet checkpoint: $RECNET_CKPT"

python - <<EOF
import json
conf = json.load(open('configs/2-refinement.json'))
conf['generator_model']['pretrained_model']['pretrained_weights'] = [
    '$RECNET_CKPT', 'model']
json.dump(conf, open('$LOG_DIR/2-refinement.json', 'w'))
EOF
python train.py "$LOG_DIR/2-refinement.json" --log-dir "$LOG_DIR" --conf \
  train_dataset=Synthetic validation_dataset=Synthetic \
  'synthetic={"image_size": 256, "num_train": 128, "num_val": 16}' \
  num_epochs=$REFINE_EPOCHS num_data_workers=0 use_tensorboard=False \
  num_image_summaries=0 steps_per_train_summary=100 vgg_random_init=True \
  epochs_per_validation=$REFINE_EPOCHS epochs_per_checkpoint=$REFINE_EPOCHS
REFINE_CKPT=$(ls "$LOG_DIR"/2-refinement_*/periodic-chkpt_*.ckpt | tail -1)
echo "refinement checkpoint: $REFINE_CKPT"
echo "DONE: quality table via"
echo "  python scripts/quality_dtype_table.py --checkpoint $REFINE_CKPT"
