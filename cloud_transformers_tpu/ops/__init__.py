"""Pallas TPU kernels for the hot splat/slice path.

Populated after the XLA baselines are benchmarked (SURVEY.md §7 step 6):
kernels only earn their place here by beating the corresponding XLA lowering
on the real chip.
"""
