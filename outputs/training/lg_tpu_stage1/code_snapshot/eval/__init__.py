"""Benchmark registry (reference: gluefactory/eval/__init__.py:12-20)."""


def get_benchmark(name: str):
    from . import hpatches, megadepth1500

    benchmarks = {
        "hpatches": hpatches.HPatchesPipeline,
        "megadepth1500": megadepth1500.MegaDepth1500Pipeline,
    }
    return benchmarks[name]


def run_benchmark(name: str, conf, exp_dir, model=None, params=None):
    """In-training benchmark hook (reference eval/__init__.py:12-20)."""
    pipeline = get_benchmark(name)(conf)
    return pipeline.run(exp_dir, model=model, params=params)
