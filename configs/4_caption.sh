#!/bin/sh
# BASELINE config #4: image-caption training (COCO-style Caption_Data)
python train.py --caption_prop=1.0 --caption_dataset "${CAPTION_DATA:-Caption_Data}" \
    --embed_dim=768 --layers=6 --heads=24 --batch_size=16 -k=1024 \
    --training_steps=100000 --log_eval_freq=1000 "$@"
