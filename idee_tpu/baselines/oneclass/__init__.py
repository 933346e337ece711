"""One-Class baseline: SimpleNet over a frozen pretrained encoder.

Parity target: Baselines_OneClass/ (3,626 LoC in the reference, mostly
duplicated core) -- here only the SimpleNet head, its hinge loss, and the
train/test drivers; encoder, data, metrics come from the shared core.
"""
