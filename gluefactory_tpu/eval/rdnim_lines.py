"""RDNIM line benchmark: day/night rotated pairs, line repeatability /
localization / matching under the GT homography
(reference: gluefactory/eval/rdnim_lines.py — same metric suite as
hpatches_lines over the Rotated Day-Night Image Matching pairs).

CLI: python -m gluefactory_tpu.eval.rdnim_lines --conf <model card>
       [data.reference=day|night]
"""

from __future__ import annotations

from ..settings import EVAL_PATH
from .hpatches_lines import HPatchesLinesPipeline
from .io import get_eval_parser, parse_eval_args


class RDNIMLinesPipeline(HPatchesLinesPipeline):
    default_conf = {
        "data": {
            "name": "rdnim",
            "reference": "day",
            "preprocessing": {"resize": 480, "side": "long", "square_pad": True},
        },
    }


def main():
    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    conf = parse_eval_args("rdnim_lines", args, RDNIMLinesPipeline.default_conf)
    pipeline = RDNIMLinesPipeline(conf)
    s, _ = pipeline.run(
        EVAL_PATH / "rdnim_lines" / args.tag,
        overwrite=args.overwrite, overwrite_eval=args.overwrite_eval,
    )
    import pprint

    pprint.pprint(s)


if __name__ == "__main__":
    main()
