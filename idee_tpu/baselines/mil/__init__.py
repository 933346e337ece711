"""MIL (multiple-instance learning) baselines: DeepMIL, ARNet, RTFM, MGFN.

Parity target: Baselines_MIL/ -- encoders shared with the core, plus MLP /
MGFN classifiers, the cross-attention agent Swin, the RTFM Aggregate
network, and the ranking / magnitude losses. Bags are realised as masked
top-k over dense per-pixel scores (see idee_tpu.baselines.__doc__).
"""
