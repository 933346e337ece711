"""Reconstruction baselines: STEALNET and UniAD.

Parity target: Baselines_Reconstruction/ -- autoencoder / transformer
feature-reconstruction models trained on anomaly-replaced data, with
anomaly = reconstruction error above a normal/extreme midpoint threshold.
"""
