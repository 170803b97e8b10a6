#!/bin/bash
# Denoise all ARKitScenes evaluation scenes (reference scripts/denoise_arkit.sh)
for scene in $(ls $1)
do
    echo "Processing $scene"
    python denoise_room.py --room_path $1/$scene/scans/iphone.ply --model_path ./pretrained/PVDL_ARK_XYZ/step_100000 --steps 5 --k 4 --use_ema true --average_predictions true
done
