"""Device kernels (JAX/XLA + Pallas) for the hot loops.

Every kernel here has a scalar host oracle elsewhere in the package
(svim_tpu.collect / svim_tpu.cluster) and is cross-validated in tests.
"""
