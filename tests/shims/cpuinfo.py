"""py-cpuinfo shim: report SSE4.1 so the reference enables consensus
computation (SVIM_COMBINE.py:259).  The gate exists only because SPOA
requires SIMD; our consensus path has no ISA requirement."""


def get_cpu_info():
    return {"flags": ["sse4_1"]}
