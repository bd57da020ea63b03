#!/bin/sh
# Zero-dependency smoke run: synthetic text + synthetic control, CPU
python train.py --cpu --control_datasets neko-synth-continuous-v0 \
    --text_prop=0.5 --text_datasets synthetic --text_datasets_paths synthetic \
    --embed_dim=64 --layers=2 --heads=4 --batch_size=8 -k=128 \
    --training_steps=20 --log_eval_freq=10 --eval_episodes=1 \
    --eval_text_num_examples=2 --mixed_precision=no "$@"
