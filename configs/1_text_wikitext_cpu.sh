#!/bin/sh
# BASELINE config #1: text-only next-token training on wikitext-2-v1
# (embed_dim=128, layers=3, batch=4, CPU)
python train.py --cpu --text_prop=1.0 \
    --text_datasets wikitext-2-v1 --text_datasets_paths wikitext \
    --embed_dim=128 --layers=3 --heads=1 --batch_size=4 -k=1024 \
    --training_steps=10000 --log_eval_freq=500 "$@"
