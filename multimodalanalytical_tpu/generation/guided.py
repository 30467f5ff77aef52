"""Formula-guided (constrained) decoding.

The reference's ``GuidedFormulaProcessor`` (reference
generation/logit_processors.py:12-152) re-parses every beam with RDKit at
every decode step — the dominant cost of guided prediction. Here the same
three rules run **in-graph** from a precomputed per-token atom-count table:

  1. prefix formula == target formula  -> force EOS (score 0),
  2. prefix formula <  target formula  -> ban EOS,
  3. token would overshoot any heavy-atom count -> ban token.

The token table uses the reference's own token->atom attribution (substring
matching over the vocab, skipping H, with the C-vs-Cl disambiguation,
logit_processors.py:50-62), so rule 3 is equivalent. Rules 1-2 differ from
the reference in that the comparison covers heavy atoms only (the reference
compares RDKit formulas including implicit hydrogens); this surrogate keeps
decoding fully on-TPU. The exact H-aware check can be recovered by the
host-side rejection-sampling pass (evaluation.reject_sample).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..chem import GUIDED_ATOM_LIST, atom_counts

# Heavy atoms participating in the lookahead rule (reference skips H and only
# checks the first 9 atoms, logit_processors.py:148-149).
N_LOOKAHEAD = 9
_H_INDEX = GUIDED_ATOM_LIST.index("H")


def build_token_atom_table(vocab: dict, special_tokens: Sequence[str]) -> np.ndarray:
    """(vocab_size, n_atoms) 0/1 table: does this token add one of atom i
    (reference logit_processors.py:46-62 semantics)."""
    size = max(vocab.values()) + 1
    table = np.zeros((size, len(GUIDED_ATOM_LIST)), dtype=np.int32)
    specials = set(special_tokens)
    for token, token_id in vocab.items():
        if token in specials:
            continue
        for i, atom in enumerate(GUIDED_ATOM_LIST):
            if atom == "H":
                continue
            if atom.lower() in token.lower():
                if atom.lower() == "c" and token.lower() == "cl":
                    continue
                table[token_id, i] = 1
    return table


def target_formula_counts(target_smiles: Sequence[str]) -> np.ndarray:
    """(B, n_atoms) atom counts of the target molecules (incl. H)."""
    rows: List[List[int]] = []
    for smiles in target_smiles:
        counts = atom_counts(smiles)
        rows.append(counts if counts is not None else [0] * len(GUIDED_ATOM_LIST))
    return np.asarray(rows, dtype=np.int32)


def make_formula_hook(
    token_table: np.ndarray,     # (V, A)
    target_counts: np.ndarray,   # (B, A)
    eos_token_id: int,
):
    """Returns (hook, init_state) for ``beam_search(logits_hook=...)``.

    The hook is stateless: prefix atom counts are recomputed from the live
    sequences each step (cheap gather+sum, keeps the beam gather trivial).
    """
    table = jnp.asarray(token_table)
    target = jnp.asarray(target_counts)  # (B, A)

    def hook(state, logits, live_seqs, t):
        # logits (B, K, V); live_seqs (B, K, L) with BOS at position 0.
        b, k, vocab = logits.shape
        length = live_seqs.shape[-1]
        pos_valid = (jnp.arange(length) >= 1) & (jnp.arange(length) <= t)
        per_pos = table[live_seqs]                     # (B, K, L, A)
        counts = jnp.sum(
            per_pos * pos_valid[None, None, :, None], axis=2
        )                                              # (B, K, A)

        tgt = target[:, None, :]                       # (B, 1, A)
        heavy = jnp.arange(table.shape[1]) != _H_INDEX

        matching = jnp.all(
            jnp.where(heavy[None, None, :], counts == tgt, True), axis=-1
        )                                              # (B, K)
        too_small = jnp.any(
            jnp.where(heavy[None, None, :], counts < tgt, False), axis=-1
        )

        eos_col = jnp.zeros((b, k, vocab), bool).at[:, :, eos_token_id].set(True)
        # Rule 1: formula complete -> EOS score 0 (reference sets scores=0).
        logits = jnp.where(eos_col & matching[:, :, None], 0.0, logits)
        # Rule 2: undershooting -> ban EOS.
        logits = jnp.where(eos_col & too_small[:, :, None], -jnp.inf, logits)
        # Rule 3: lookahead on the first 9 heavy atoms.
        next_counts = counts[:, :, None, :] + table[None, None, :, :]  # (B,K,V,A)
        too_large = jnp.any(
            next_counts[..., :N_LOOKAHEAD] > tgt[:, :, None, :N_LOOKAHEAD],
            axis=-1,
        )                                              # (B, K, V)
        logits = jnp.where(too_large, -jnp.inf, logits)
        return state, logits

    return hook, None


def guided_hook_builder(tokenizer):
    """Trainer.predict adapter: batch -> (hook, init_state)."""
    table = build_token_atom_table(
        tokenizer.vocab,
        [tokenizer.pad_token, tokenizer.unk_token, tokenizer.bos_token,
         tokenizer.eos_token],
    )

    def builder(batch) -> Tuple:
        targets = target_formula_counts(batch["target_strings"])
        # The device batch may be padded past n_valid with dummy rows; pad the
        # target table to match. All-zero / dummy targets get a huge count so
        # the constraint rules never fire on them.
        padded_b = batch["encoder_mask"].shape[0]
        if targets.shape[0] < padded_b:
            targets = np.pad(targets, ((0, padded_b - targets.shape[0]), (0, 0)))
        dead = targets.sum(axis=1) == 0
        targets[dead] = 10_000
        return make_formula_hook(table, targets, tokenizer.eos_token_id)

    return builder
