"""Command-line entry points mirroring the reference's scripts:

* ``python -m nerface_tpu.cli.train``   ↔ `train_transformed_rays.py`
* ``python -m nerface_tpu.cli.eval``    ↔ `eval_transformed_rays.py`
* ``python -m nerface_tpu.cli.metrics`` ↔ `nerf/metrics.py`
"""
