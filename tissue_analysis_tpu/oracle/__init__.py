from tissue_analysis_tpu.oracle.scipy_oracle import ScipyOracle  # noqa: F401
