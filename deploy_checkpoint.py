#!/usr/bin/env python
"""Checkpoint deploy tool: strip a training checkpoint for inference.

Rebuild of /root/reference/utils/deploy_checkpoint.py:23-33 — removes
optimizer and discriminator state, keeping only the inference network
(standard→model, adversarial→generator).
"""

import argparse
import sys

from csmri_refinement_tpu.utils.checkpoints import (
    inference_checkpoint_from_training_checkpoint, load_checkpoint,
    save_raw_checkpoint)

parser = argparse.ArgumentParser(
    description='Make inference checkpoint from training checkpoint')
parser.add_argument('runner_type', choices=['standard', 'adversarial'],
                    help='Runner type the checkpoint was trained with')
parser.add_argument('input_checkpoint', help='Path to input checkpoint')
parser.add_argument('output_checkpoint', help='Path to output checkpoint')


def main(argv):
  args = parser.parse_args(argv)
  checkpoint = load_checkpoint(args.input_checkpoint)
  inference_checkpoint = inference_checkpoint_from_training_checkpoint(
      checkpoint, args.runner_type)
  save_raw_checkpoint(args.output_checkpoint, inference_checkpoint)
  print('Wrote inference checkpoint to {}'.format(args.output_checkpoint))


if __name__ == '__main__':
  main(sys.argv[1:])
