from setuptools import find_packages, setup

setup(
    name="network-feature-extractor-spark",
    version="0.1.0",
    description=(
        "PySpark-native feature-engineering engine for multi-turn "
        "transcripts: as-of joins, sessionization, windowed features, "
        "dedup/similarity/text-analysis operators"
    ),
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
    install_requires=["pyspark>=3.5", "pandas>=2.0", "numpy>=1.24", "pyarrow>=12"],
)
