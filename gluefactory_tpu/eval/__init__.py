"""Benchmark registry (reference: gluefactory/eval/__init__.py:12-20)."""


def get_benchmark(name: str):
    from . import (
        eth3d,
        hpatches,
        hpatches_extended,
        hpatches_lines,
        megadepth1500,
        megadepth1500_extended,
        rdnim_lines,
        scannet1500,
        wireframe,
    )

    benchmarks = {
        "hpatches": hpatches.HPatchesPipeline,
        "hpatches_extended": hpatches_extended.HPatchesExtendedPipeline,
        "hpatches_lines": hpatches_lines.HPatchesLinesPipeline,
        "rdnim_lines": rdnim_lines.RDNIMLinesPipeline,
        "megadepth1500": megadepth1500.MegaDepth1500Pipeline,
        "megadepth1500_extended":
            megadepth1500_extended.MegaDepth1500ExtendedPipeline,
        "scannet1500": scannet1500.ScanNet1500Pipeline,
        "eth3d": eth3d.ETH3DPipeline,
        "wireframe": wireframe.WireframePipeline,
    }
    return benchmarks[name]


def run_benchmark(name: str, conf, exp_dir, model=None, params=None):
    """In-training benchmark hook (reference eval/__init__.py:12-20)."""
    pipeline = get_benchmark(name)(conf)
    return pipeline.run(exp_dir, model=model, params=params)
