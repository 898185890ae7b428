"""TPU-native (JAX/XLA/Pallas) framework with the capabilities of Rachfu/EEG-multimodal.

Re-implements the DP-MLD research stack (differentially-private multimodal
classification of Parkinson's freezing-of-gait from EEG + wearable-motion
features) as an idiomatic JAX design:

- ``data``     : CSV/pickle ingest, WordPiece tokenizer, sensor->image transforms,
                 device-resident datasets (ref: python/src/data, dataset.py)
- ``models``   : torch-semantics transformer layers, BERT-base, fusion heads
                 (ref: python/src/custom_models/models.py, model.py)
- ``ops``      : the DP mechanism (Laplace noise + Gumbel dropout) as fused ops
                 (ref: models.py:73-79), Pallas TPU kernels
- ``dp``       : DP-SGD (per-example grads, clipping, noise) + RDP accountant
                 (ref: base_train.py:320-434 / opacus)
- ``train``    : jitted alternating-optimizer trainer, metrics, legacy record
                 format, checkpoints (ref: base_train.py:47-553, train.py)
- ``parallel`` : jax.sharding mesh helpers for data/model-parallel execution
- ``experiments``: the six experiment drivers (ref: demo.py, compare_*.py)
"""

__version__ = "0.1.0"
