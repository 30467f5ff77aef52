"""Formula-guided (constrained) decoding.

The reference's ``GuidedFormulaProcessor`` (reference
generation/logit_processors.py:12-152) re-parses every beam with RDKit at
every decode step — the dominant cost of guided prediction. Two modes here:

``surrogate`` (default, fully on-TPU): the same three rules run in-graph
from a precomputed per-token atom-count table:

  1. prefix formula == target formula  -> force EOS (score 0),
  2. prefix formula <  target formula  -> ban EOS,
  3. token would overshoot any heavy-atom count -> ban token.

Rules 1-2 cover heavy atoms only (the reference compares RDKit formulas
including implicit hydrogens, logit_processors.py:115-128); rule 3 uses the
reference's own token->atom attribution (substring matching over the vocab,
skipping H, with the C-vs-Cl disambiguation, logit_processors.py:50-62) and
is exactly equivalent.

``exact`` (parity mode, host callback): rules 1-2 run on the host via
``jax.experimental.io_callback`` — each step the live prefixes are decoded,
canonicalized by the C++ chem engine and their FULL formulas (including
implicit H; invalid SMILES -> zero counts, exactly the reference's
``CalcMolFormula``-of-empty behaviour, logit_processors.py:104-120) compared
against the target. Rule 3 stays in-graph (it is table-based in the
reference too). Slower (one host round-trip per decode step) but
bit-matches the reference's constraint set.

Both modes are built ONCE per run: the per-batch target formula counts ride
in the beam-search hook state (a traced argument), so the decode graph never
recompiles across batches.

Hook protocol (see beam_search): hooks receive LOG-PROBS, matching the HF
pipeline where logits processors run after ``log_softmax`` — so rule 1's
``score[eos] = 0`` genuinely forces EOS (0 >= any log-prob).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
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


def _prefix_heavy_counts(table: jnp.ndarray, live_seqs: jnp.ndarray, t):
    """(B, K, A) heavy-atom counts of each live prefix (positions 1..t)."""
    length = live_seqs.shape[-1]
    pos_valid = (jnp.arange(length) >= 1) & (jnp.arange(length) <= t)
    per_pos = table[live_seqs]                         # (B, K, L, A)
    return jnp.sum(per_pos * pos_valid[None, None, :, None], axis=2)


def _apply_rules(logprobs, counts, target, table, eos_token_id, heavy_only):
    """Shared constraint application.

    ``counts``: (B, K, A) formula counts of the prefixes — heavy-only in
    surrogate mode, full (incl. H) in exact mode. ``target``: (B, K, A).
    ``heavy_only``: whether rules 1-2 should ignore the H column.
    """
    b, k, vocab = logprobs.shape
    if heavy_only:
        relevant = jnp.arange(table.shape[1]) != _H_INDEX
        matching = jnp.all(
            jnp.where(relevant[None, None, :], counts == target, True), axis=-1
        )
        too_small = jnp.any(
            jnp.where(relevant[None, None, :], counts < target, False), axis=-1
        )
    else:
        matching = jnp.all(counts == target, axis=-1)
        too_small = jnp.any(counts < target, axis=-1)

    eos_col = jnp.zeros((b, k, vocab), bool).at[:, :, eos_token_id].set(True)
    # Rule 1: formula complete -> EOS score 0 (forces EOS: log-probs <= 0).
    logprobs = jnp.where(eos_col & matching[:, :, None], 0.0, logprobs)
    # Rule 2: undershooting -> ban EOS.
    logprobs = jnp.where(eos_col & too_small[:, :, None], -jnp.inf, logprobs)
    # Rule 3: lookahead over the first 9 atoms — all heavy, so the counts
    # source (table-derived or host-derived) is used as-is; the reference
    # also increments its RDKit-derived prefix formula by the token table
    # (logit_processors.py:131-150).
    next_counts = (
        counts[:, :, None, :N_LOOKAHEAD]
        + table[None, None, :, :N_LOOKAHEAD]
    )                                                  # (B, K, V, 9)
    too_large = jnp.any(
        next_counts > target[:, :, None, :N_LOOKAHEAD], axis=-1
    )                                                  # (B, K, V)
    return jnp.where(too_large, -jnp.inf, logprobs)


def make_formula_hook(token_table: np.ndarray, eos_token_id: int):
    """Surrogate (fully in-graph) guided hook.

    Returns ``hook(state, logprobs, live_seqs, t) -> (state, logprobs)``.
    ``state`` must be ``{"target": (B, K, A) int32}`` — per-batch target
    formula counts tiled across beams (traced, so one compile serves every
    batch; beam reordering permutes it harmlessly).
    """
    table = jnp.asarray(token_table)

    def hook(state, logprobs, live_seqs, t):
        counts = _prefix_heavy_counts(table, live_seqs, t)
        out = _apply_rules(
            logprobs, counts, state["target"], table, eos_token_id,
            heavy_only=True,
        )
        return state, out

    return hook


def make_exact_formula_hook(
    token_table: np.ndarray,
    eos_token_id: int,
    decode_tokens: Callable[[np.ndarray], List[str]],
):
    """Exact (reference-parity) guided hook.

    ``decode_tokens``: host function mapping an (N, L) int array of token ids
    to N SMILES strings (specials stripped). Each step the live prefixes are
    canonicalized on the host and their full formulas (incl. implicit H)
    drive rules 1-2 (reference logit_processors.py:104-128); rule 3 stays
    in-graph. Invalid prefixes count as all-zero formulas, like the
    reference's empty-string encoding.
    """
    table = jnp.asarray(token_table)
    n_atoms = len(GUIDED_ATOM_LIST)

    def host_counts(live_seqs: np.ndarray, t: np.ndarray) -> np.ndarray:
        b, k, length = live_seqs.shape
        prefixes = np.array(live_seqs).reshape(b * k, length)
        # Zero-out positions beyond t (the hook sees post-BOS prefixes of
        # length t); decode_tokens strips specials/pads.
        smiles = decode_tokens(prefixes[:, : int(t) + 1])
        rows = np.zeros((b * k, n_atoms), dtype=np.int32)
        for i, s in enumerate(smiles):
            counts = atom_counts(s)
            if counts is not None:
                rows[i] = counts
        return rows.reshape(b, k, n_atoms)

    def hook(state, logprobs, live_seqs, t):
        b, k, _ = logprobs.shape
        counts = jax.experimental.io_callback(
            host_counts,
            jax.ShapeDtypeStruct((b, k, n_atoms), jnp.int32),
            live_seqs, t, ordered=False,
        )
        out = _apply_rules(
            logprobs, counts, state["target"], table, eos_token_id,
            heavy_only=False,
        )
        return state, out

    return hook


class GuidedDecoder:
    """Adapter wiring guided decoding into ``Trainer.predict``.

    Built once per run; ``hook`` is a pure closure over static tables and
    ``state_for(batch, num_beams)`` produces the per-batch hook state, so the
    beam-search graph compiles exactly once.
    """

    def __init__(self, tokenizer, mode: str = "surrogate"):
        if mode not in ("surrogate", "exact"):
            raise ValueError(f"unknown guided_generation mode: {mode!r}")
        self.mode = mode
        self.tokenizer = tokenizer
        table = build_token_atom_table(
            tokenizer.vocab,
            [tokenizer.pad_token, tokenizer.unk_token, tokenizer.bos_token,
             tokenizer.eos_token],
        )
        if mode == "surrogate":
            self.hook = make_formula_hook(table, tokenizer.eos_token_id)
        else:
            def decode_tokens(ids: np.ndarray) -> List[str]:
                return tokenizer.batch_decode(ids, skip_special_tokens=True)

            self.hook = make_exact_formula_hook(
                table, tokenizer.eos_token_id, decode_tokens
            )

    def state_for(self, batch, num_beams: int):
        """{"target": (B, K, A)} hook state for this batch (B = padded)."""
        targets = target_formula_counts(batch["target_strings"])
        padded_b = batch["encoder_mask"].shape[0]
        if targets.shape[0] < padded_b:
            targets = np.pad(targets, ((0, padded_b - targets.shape[0]), (0, 0)))
        # Dummy / unparseable targets get a huge count so no rule ever fires.
        dead = targets.sum(axis=1) == 0
        targets[dead] = 10_000
        tiled = np.repeat(targets[:, None, :], num_beams, axis=1)
        return {"target": jnp.asarray(tiled)}


def guided_hook_builder(tokenizer, mode: str = "surrogate") -> GuidedDecoder:
    """Build the guided-decoding adapter (kept name for API continuity)."""
    return GuidedDecoder(tokenizer, mode=mode)
