"""Package setup: installs spr_pick_tpu with the `joint` console entry point
(parity with the reference's `setup.py:9` entry point name)."""

from setuptools import find_packages, setup

setup(
    name="spr_pick_tpu",
    version="0.1.0",
    description=(
        "TPU-native joint cryo-EM micrograph denoising + particle picking "
        "(JAX/XLA/Pallas)"
    ),
    packages=find_packages(include=["spr_pick_tpu", "spr_pick_tpu.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "numpy",
        "pandas",
        "pillow",
        "scipy",
    ],
    entry_points={
        "console_scripts": [
            "joint=spr_pick_tpu.cli.cli:start",
        ]
    },
)
