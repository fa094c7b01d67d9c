"""L1 matrix factorization engines: rrLU, CI, ACA, LUCI, SVD truncation,
Gauss-Kronrod rules. The numerically hot loops run as jit-compiled fixed-shape
XLA kernels (see lu_kernel.py) rather than Python loops."""
