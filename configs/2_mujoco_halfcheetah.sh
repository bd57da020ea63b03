#!/bin/sh
# BASELINE config #2: MuJoCo locomotion BC (mu-law continuous tokens, k=240)
python train.py --control_datasets d4rl_halfcheetah-expert-v2 \
    --embed_dim=768 --layers=6 --heads=24 --batch_size=32 -k=240 \
    --training_steps=100000 --log_eval_freq=1000 "$@"
