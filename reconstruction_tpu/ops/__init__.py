"""Hot-op kernels: Pallas TPU implementations + XLA reference paths.

Every Pallas kernel here has a semantically-matched XLA implementation in
stereo/ (the behavioral reference, oracle-tested); kernels are selected
via config/flags and validated against the XLA path in tests (interpret
mode on CPU, compiled on TPU).
"""
