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
    target = np.zeros((1, 2, len(GUIDED_ATOM_LIST)), np.int32)
    target[0, :, GUIDED_ATOM_LIST.index("C")] = 2
    hook = make_formula_hook(table, eos)
    state = {"target": jnp.asarray(target)}

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


def test_exact_hook_matches_reference_semantics():
    """Exact mode: full-formula (incl. H) compare via host callback.

    Target CCO = C2H6O. Prefix "CCO" has the right heavy atoms AND right
    H-count -> EOS forced. Prefix "CC(C)O" overshoots C -> banned earlier by
    rule 3; prefix "CO" undershoots -> EOS banned. The surrogate would force
    EOS on ANY C2+O prefix regardless of H; exact requires a valid molecule
    with matching implicit-H formula.
    """
    from multimodalanalytical_tpu.generation.guided import (
        make_exact_formula_hook,
    )

    tok = _tok()
    table = build_token_atom_table(tok.vocab, ["<pad>", "<unk>", "<bos>", "<eos>"])
    vocab = tok.vocab
    eos = tok.eos_token_id
    vocab_size = max(vocab.values()) + 1
    hook = make_exact_formula_hook(
        table, eos, lambda ids: tok.batch_decode(ids, skip_special_tokens=True)
    )

    target = np.tile(
        target_formula_counts(["CCO"])[:, None, :], (1, 2, 1)
    )  # (1, 2, A)
    state = {"target": jnp.asarray(target)}

    live = np.full((1, 2, 8), tok.pad_token_id, np.int32)
    live[0, :, 0] = tok.bos_token_id
    # beam 0: C C O  (exact match C2H6O)
    live[0, 0, 1:4] = [vocab["C"], vocab["C"], vocab["O"]]
    # beam 1: C O    (undershoot)
    live[0, 1, 1:3] = [vocab["C"], vocab["O"]]

    logits = jnp.zeros((1, 2, vocab_size))
    _, out = hook(state, logits, jnp.asarray(live), 3)
    out = np.asarray(out)

    assert out[0, 0, eos] == 0.0          # complete -> EOS forced
    assert out[0, 0, vocab["C"]] == -np.inf  # C overshoot banned
    assert out[0, 1, eos] == -np.inf      # undershoot -> EOS banned
    assert out[0, 1, vocab["C"]] == 0.0


def test_exact_hook_h_divergence_from_surrogate():
    """C=C vs CC: same heavy atoms (C2), different H (C2H4 vs C2H6).

    Surrogate (heavy-only) forces EOS on both prefixes; exact only on the
    H-matching one — the reference's behaviour
    (logit_processors.py:115-124 compares CalcMolFormula incl. H).
    """
    from multimodalanalytical_tpu.generation.guided import (
        make_exact_formula_hook,
    )

    tok = build_regex_tokenizer(["C=C", "CC", "CCO"], SMILES_REGEX)
    table = build_token_atom_table(tok.vocab, ["<pad>", "<unk>", "<bos>", "<eos>"])
    vocab = tok.vocab
    eos = tok.eos_token_id
    vocab_size = max(vocab.values()) + 1

    target = np.tile(target_formula_counts(["CC"])[:, None, :], (1, 2, 1))
    state = {"target": jnp.asarray(target)}

    live = np.full((1, 2, 8), tok.pad_token_id, np.int32)
    live[0, :, 0] = tok.bos_token_id
    live[0, 0, 1:3] = [vocab["C"], vocab["C"]]            # CC  (C2H6: match)
    live[0, 1, 1:4] = [vocab["C"], vocab["="], vocab["C"]]  # C=C (C2H4: no)
    logits = jnp.zeros((1, 2, vocab_size))

    exact_hook = make_exact_formula_hook(
        table, eos, lambda ids: tok.batch_decode(ids, skip_special_tokens=True)
    )
    _, exact_out = exact_hook(state, logits, jnp.asarray(live), 3)
    exact_out = np.asarray(exact_out)
    assert exact_out[0, 0, eos] == 0.0
    assert exact_out[0, 1, eos] == -np.inf  # H undershoot (4 < 6) bans EOS

    surro_hook = make_formula_hook(table, eos)
    _, surro_out = surro_hook(state, logits, jnp.asarray(live), 3)
    surro_out = np.asarray(surro_out)
    # surrogate can't see H: both prefixes "match"
    assert surro_out[0, 0, eos] == 0.0
    assert surro_out[0, 1, eos] == 0.0


def test_guided_decoder_single_compile():
    """GuidedDecoder + Trainer-style jitted decode compiles once across
    batches with different targets (ADVICE r1: per-batch re-jit)."""
    import jax

    from multimodalanalytical_tpu.generation.beam_search import beam_search
    from __graft_entry__ import _example_batch, _flagship

    model = _flagship(d_model=64, layers=1, ffn=128, vocab=16)
    batch = _example_batch(batch=2, target_len=6, vocab=16)
    variables = model.init(
        jax.random.PRNGKey(0), batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        deterministic=True,
    )
    # model vocab is 16; build a table sized to it
    table = np.zeros((16, len(GUIDED_ATOM_LIST)), np.int32)
    from multimodalanalytical_tpu.generation.guided import make_formula_hook

    hook = make_formula_hook(table, eos_token_id=2)

    compiles = {"n": 0}

    def decode(params, enc, mask, hook_state):
        compiles["n"] += 1  # python tracing counter
        return beam_search(
            model, {"params": params}, enc, mask, num_beams=2, max_length=8,
            logits_hook=hook, hook_init=hook_state,
        )

    decode_jit = jax.jit(decode)
    for i in range(3):
        target = np.full((2, 2, len(GUIDED_ATOM_LIST)), i + 1, np.int32)
        seqs, _ = decode_jit(
            variables["params"], batch["encoder_inputs"],
            batch["encoder_mask"], {"target": jnp.asarray(target)},
        )
        assert seqs.shape == (2, 2, 8)
    assert compiles["n"] == 1, "guided decode retraced across batches"


def test_surrogate_subsumes_exact_on_corpus():
    """Relationship between the two guided modes over a molecule corpus:

    * rule 1: exact-matching prefixes (full formula incl. H) are a SUBSET of
      surrogate-matching prefixes (heavy atoms only) — wherever exact forces
      EOS, surrogate forces EOS too;
    * rule 2: surrogate's heavy-atom undershoot implies exact's undershoot
      (heavy < target_heavy => formula < target) — wherever surrogate bans
      EOS, exact bans EOS.
    """
    from multimodalanalytical_tpu.generation.guided import (
        make_exact_formula_hook,
        make_formula_hook,
    )

    corpus = ["CCO", "CC(=O)O", "c1ccccc1", "CCN", "CCS", "CC(C)O",
              "CC(=O)OCl", "C=CC", "CC#N"]
    tok = build_regex_tokenizer(corpus, SMILES_REGEX)
    table = build_token_atom_table(
        tok.vocab, ["<pad>", "<unk>", "<bos>", "<eos>"])
    eos = tok.eos_token_id
    vocab_size = max(tok.vocab.values()) + 1
    surro = make_formula_hook(table, eos)
    exact = make_exact_formula_hook(
        table, eos, lambda ids: tok.batch_decode(ids, skip_special_tokens=True)
    )

    checked = 0
    for target in corpus:
        target_counts = target_formula_counts([target])
        for prefix_mol in corpus:
            enc = tok([prefix_mol], padding="max_length", max_length=16)
            ids = np.asarray(enc["input_ids"][0])
            # live row: BOS + tokens, strip eos/pad to make an open prefix
            body = [t for t in ids if t not in
                    (tok.pad_token_id, tok.eos_token_id)]
            live = np.full((1, 1, 16), tok.pad_token_id, np.int32)
            live[0, 0, :len(body)] = body
            t = len(body) - 1
            state = {"target": jnp.asarray(target_counts[:, None, :])}
            logits = jnp.zeros((1, 1, vocab_size))
            _, s_out = surro(state, logits, jnp.asarray(live), t)
            _, e_out = exact(state, logits, jnp.asarray(live), t)
            s_out = np.asarray(s_out)
            e_out = np.asarray(e_out)
            if e_out[0, 0, eos] == 0.0 and np.isfinite(e_out[0, 0, eos]):
                assert s_out[0, 0, eos] == 0.0, (target, prefix_mol)
            if s_out[0, 0, eos] == -np.inf:
                assert e_out[0, 0, eos] == -np.inf, (target, prefix_mol)
            checked += 1
    assert checked == len(corpus) ** 2
