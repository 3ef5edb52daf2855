"""Benchmark registry (reference: gluefactory/eval/__init__.py:12-20)."""


def get_benchmark(name: str):
    from . import eth3d, hpatches, hpatches_extended, megadepth1500, scannet1500

    benchmarks = {
        "hpatches": hpatches.HPatchesPipeline,
        "hpatches_extended": hpatches_extended.HPatchesExtendedPipeline,
        "megadepth1500": megadepth1500.MegaDepth1500Pipeline,
        "scannet1500": scannet1500.ScanNet1500Pipeline,
        "eth3d": eth3d.ETH3DPipeline,
    }
    return benchmarks[name]


def run_benchmark(name: str, conf, exp_dir, model=None, params=None):
    """In-training benchmark hook (reference eval/__init__.py:12-20)."""
    pipeline = get_benchmark(name)(conf)
    return pipeline.run(exp_dir, model=model, params=params)
