"""Pure numpy/pyarrow codec kernels. No Ray dependency in this package."""
