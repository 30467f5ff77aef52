"""TPU-native analytical foundation models.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of IBM's
``analytical_fm`` framework (reference: rxn4chemistry/MultimodalAnalytical):
multimodal encoder-decoder models translating analytical spectra
(IR, 1H/13C NMR, MS/MS, 31P NMR) into chemical structures (SMILES).

Design stance (TPU-first, not a port):
  * one Flax encoder-decoder family replaces the reference's four torch
    model types (reference: src/analytical_fm/modeling/wrapper.py:222-227);
  * static shapes everywhere so XLA compiles once;
  * jitted beam search with KV cache (the reference disables its cache,
    reference wrapper.py:450);
  * GSPMD data/tensor parallel over a jax.sharding.Mesh instead of DDP;
  * a first-party C++ chemistry kernel (SMILES canonicalisation, formulas)
    where the reference used RDKit.
"""

__version__ = "0.1.0"
