"""Build test_data.pkl chunks from raw heatmaps/depths/SLAM/GT.

CLI for the preprocessing ETL (reference:
MakeDataForOptimization/process_test_data.py:167-184):

    python -m globalegomocap_tpu.cli.preprocess \
        --slam data/seq/frame_trajectory.txt \
        --heatmap_dir .../heatmaps --depth_dir .../depths \
        --gt data/seq/gt.pkl --out corrected_data/seq \
        --start 551 --end 3300 [--fps 25] [--chunk 100]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--slam", required=True, type=str)
    p.add_argument("--heatmap_dir", required=True, type=str)
    p.add_argument("--depth_dir", required=True, type=str)
    p.add_argument("--gt", required=True, type=str)
    p.add_argument("--out", required=True, type=str)
    p.add_argument("--start", required=True, type=int)
    p.add_argument("--end", required=True, type=int)
    p.add_argument("--fps", default=25.0, type=float)
    p.add_argument("--chunk", default=100, type=int)
    p.add_argument("--mat_start_frame", default=None, type=int)
    p.add_argument("--calibration", default=None, type=str)
    args = p.parse_args(argv)

    from globalegomocap_tpu.tools.process_test_data import process_sequence
    return process_sequence(
        args.slam, args.heatmap_dir, args.depth_dir, args.gt, args.out,
        args.start, args.end, fps=args.fps, chunk_size=args.chunk,
        mat_start_frame=args.mat_start_frame,
        calibration_path=args.calibration)


if __name__ == "__main__":
    main()
