"""Guided (formula-constrained) decoding tests."""

import jax.numpy as jnp
import numpy as np

from multimodalanalytical_tpu.data.tokenizer import build_regex_tokenizer
from multimodalanalytical_tpu.generation.guided import (
    build_token_atom_table,
    make_formula_hook,
    target_formula_counts,
)
from multimodalanalytical_tpu.chem import GUIDED_ATOM_LIST

SMILES_REGEX = (
    r"(\[[^\]]+]|Br?|Cl?|N|O|S|P|F|I|b|c|n|o|s|p|\(|\)|\.|=|#|-|\+|\\\\|\/|:"
    r"|~|@|\?|>|\*|\$|\%[0-9]{2}|[0-9])"
)


def _tok():
    return build_regex_tokenizer(
        ["CCO", "CCN", "c1ccccc1", "CC(=O)OCl", "CCS"], SMILES_REGEX
    )


def test_token_atom_table_semantics():
    tok = _tok()
    table = build_token_atom_table(tok.vocab, ["<pad>", "<unk>", "<bos>", "<eos>"])
    vocab = tok.vocab
    c_idx = GUIDED_ATOM_LIST.index("C")
    cl_idx = GUIDED_ATOM_LIST.index("Cl")
    # "C" counts as carbon, "Cl" counts as chlorine but NOT carbon.
    assert table[vocab["C"], c_idx] == 1
    assert table[vocab["Cl"], c_idx] == 0
    assert table[vocab["Cl"], cl_idx] == 1
    # aromatic c counts as carbon
    assert table[vocab["c"], c_idx] == 1
    # specials contribute nothing
    assert table[vocab["<eos>"]].sum() == 0


def test_target_formula_counts():
    counts = target_formula_counts(["CCO", "bad("])
    c_idx = GUIDED_ATOM_LIST.index("C")
    h_idx = GUIDED_ATOM_LIST.index("H")
    assert counts[0, c_idx] == 2 and counts[0, h_idx] == 6
    assert counts[1].sum() == 0  # invalid target -> zeros


def test_hook_rules():
    tok = _tok()
    table = build_token_atom_table(tok.vocab, ["<pad>", "<unk>", "<bos>", "<eos>"])
    vocab = tok.vocab
    eos = tok.eos_token_id
    vocab_size = max(vocab.values()) + 1

    # Target: C2 (heavy atoms). Beam 0 prefix "C C" (complete); beam 1 prefix
    # "C" (undershoot).
    target = np.zeros((1, len(GUIDED_ATOM_LIST)), np.int32)
    target[0, GUIDED_ATOM_LIST.index("C")] = 2
    hook, state = make_formula_hook(table, target, eos)

    live = np.full((1, 2, 8), tok.pad_token_id, np.int32)
    live[0, :, 0] = tok.bos_token_id
    live[0, 0, 1] = vocab["C"]
    live[0, 0, 2] = vocab["C"]
    live[0, 1, 1] = vocab["C"]
    # pad positions beyond prefix are pad tokens -> ensure pad has no atoms
    logits = jnp.zeros((1, 2, vocab_size))
    _, out = hook(state, logits, jnp.asarray(live), 2)
    out = np.asarray(out)

    # Beam 0: formula complete -> EOS forced to 0, any C-token banned
    # (2+1 > 2 overshoots).
    assert out[0, 0, eos] == 0.0
    assert out[0, 0, vocab["C"]] == -np.inf
    # Beam 1: undershoot -> EOS banned, C allowed.
    assert out[0, 1, eos] == -np.inf
    assert out[0, 1, vocab["C"]] == 0.0
