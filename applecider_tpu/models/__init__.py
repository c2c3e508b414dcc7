"""Flax model families.

* ``baseline_cls`` — photometry transformer (Time2Vec + CLS transformer)
* ``mpt``          — masked-event pretraining heads over the same encoder
* ``spectranet``   — multi-kernel 1-D CNN for spectra (classifier/redshift)
* ``convnext``     — ConvNeXt-tiny backbone (reimplementation of the timm
                     backbone the reference depends on)
* ``astrominn``    — image+metadata mixture-of-experts classifier
* ``fusion``       — 4-modality late-fusion AppleCider model
"""
