"""Common utilities: logging, seeding (reference: pcdet/utils/common_utils.py)."""
from __future__ import annotations

import logging
import random

import numpy as np


def create_logger(log_file=None, rank=0, log_level=logging.INFO):
    """Rank-gated logger (common_utils.py:103-117)."""
    logger = logging.getLogger(str(log_file) if log_file else "dfu3d")
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    if logger.handlers:
        return logger
    formatter = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    console = logging.StreamHandler()
    console.setLevel(log_level if rank == 0 else logging.ERROR)
    console.setFormatter(formatter)
    logger.addHandler(console)
    if log_file is not None:
        fh = logging.FileHandler(log_file)
        fh.setLevel(log_level if rank == 0 else logging.ERROR)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    return logger


def set_random_seed(seed: int):
    """Host-side seeding (common_utils.py:120-135). JAX device randomness is
    explicit via PRNG keys derived from the same seed."""
    random.seed(seed)
    np.random.seed(seed)


def maybe_force_platform():
    """Honor DFU3D_PLATFORM=cpu|tpu before first backend use. The axon
    sitecustomize pins JAX_PLATFORMS=axon at interpreter start, so plain env
    vars cannot force CPU; the config API can (see tests/conftest.py)."""
    import os

    plat = os.environ.get("DFU3D_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
        if plat == "cpu" and "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + " --xla_force_host_platform_device_count="
                + os.environ.get("DFU3D_CPU_DEVICES", "1")
            )
