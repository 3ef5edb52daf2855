"""ScanNet-1500 indoor relative-pose benchmark
(reference: gluefactory/eval/scannet-1500.py — LoFTR-style indoor pose AUC).

Same cache-first flow as MegaDepth-1500 (calibrated image pairs -> robust
essential -> pose AUC@{5,10,20}°) with the indoor pair list/resolution
defaults. Expects ``scannet1500/pairs_calibrated.txt`` + images under
DATA_PATH (datasets/image_pairs.py line format)."""

from __future__ import annotations

from .io import get_eval_parser, parse_eval_args
from .megadepth1500 import MegaDepth1500Pipeline
from ..settings import EVAL_PATH


class ScanNet1500Pipeline(MegaDepth1500Pipeline):
    default_conf = {
        "data": {
            "name": "image_pairs",
            "pairs": "scannet1500/pairs_calibrated.txt",
            "root": "scannet1500/images",
            "preprocessing": {"resize": 640, "side": "long", "square_pad": True},
            "test_batch_size": 1,
            "num_workers": 2,
        },
    }


def main():
    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    conf = parse_eval_args("scannet1500", args, ScanNet1500Pipeline.default_conf)
    pipeline = ScanNet1500Pipeline(conf)
    s, _ = pipeline.run(
        EVAL_PATH / "scannet1500" / args.tag,
        overwrite=args.overwrite, overwrite_eval=args.overwrite_eval,
    )
    import pprint

    pprint.pprint(s)


if __name__ == "__main__":
    main()
