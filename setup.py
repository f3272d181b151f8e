from setuptools import find_packages, setup

setup(
    name="audiocaption_tpu",
    version="0.1.0",
    description="TPU-native audio captioning framework "
                "(JAX/XLA/Pallas re-design of wsntxxn/AudioCaption)",
    packages=find_packages(exclude=("tests",)),
    package_data={"audiocaption_tpu.native": ["*.cc"]},
    python_requires=">=3.10",
    install_requires=[
        "jax", "flax", "optax", "numpy", "pyyaml", "h5py", "scipy",
    ],
    extras_require={
        "data": ["torch", "pandas"],
        "metrics": ["nltk"],
    },
)
