#!/usr/bin/env bash
# Assemble the frames rendered by record_plys.py into a movie
# (the reference pairs RecordPLYs.py with an ffmpeg one-liner,
#  /root/reference/create_movie.sh:2).
# usage: ./create_movie.sh <frames_dir> [out.mp4] [fps]
set -euo pipefail
DIR="${1:?usage: create_movie.sh <frames_dir> [out.mp4] [fps]}"
OUT="${2:-movie.mp4}"
FPS="${3:-10}"
ffmpeg -y -framerate "$FPS" -i "$DIR/frame_%05d.png" \
    -c:v libx264 -pix_fmt yuv420p -crf 20 "$OUT"
echo "wrote $OUT"
