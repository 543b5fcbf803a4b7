"""Accuracy summarizer CLI (helper/summary.py equivalent).

Usage:
    python -m iadr1_tpu.cli.summarize --answers-json results/answers_0_shot.json \
        [--normal-flag good] [--overkill-miss] [--heatmap]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--answers-json", required=True)
    parser.add_argument("--normal-flag", default="good")
    parser.add_argument("--overkill-miss", action="store_true")
    parser.add_argument("--heatmap", action="store_true")
    args = parser.parse_args(argv)

    from iadr1_tpu.eval.summary import summarize_answers_file

    df = summarize_answers_file(
        args.answers_json, args.normal_flag, args.overkill_miss,
        save_heatmap=args.heatmap,
    )
    print(df.round(2).to_string())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
