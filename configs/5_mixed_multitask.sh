#!/bin/sh
# BASELINE config #5: mixed multi-task text+VQA+control proportional sampling
python train.py \
    --control_datasets d4rl_halfcheetah-expert-v2 Breakout-top1-s1-v0 \
    --text_prop=0.3 --vqa_prop=0.2 \
    --text_datasets wikitext-2-v1 --text_datasets_paths wikitext \
    --vqa_dataset "${VQA_DATA:-VQA_Data}" --vqa_train_data train0 --vqa_test_data test0 \
    --embed_dim=768 --layers=6 --heads=24 --batch_size=32 -k=1024 \
    --training_steps=100000 --log_eval_freq=1000 "$@"
