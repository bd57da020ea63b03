#!/bin/sh
# BASELINE config #3: Atari Breakout (image-patch obs + discrete actions, k=512)
python train.py --control_datasets Breakout-top1-s1-v0 \
    --embed_dim=128 --layers=3 --heads=1 --batch_size=4 -k=512 \
    --training_steps=100000 --log_eval_freq=1000 "$@"
