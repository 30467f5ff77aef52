"""Beam-search semantics parity against HuggingFace ``generate``.

The framework's decode claim is HF-equivalent beam semantics with the
reference's generation config (reference modeling/wrapper.py:308-315:
``num_beams=n, num_return_sequences=n, length_penalty=1.0,
forced_eos_token_id=eos, use_cache=False``). The golden test pins OUR
results; this test checks them against HF itself: a table-driven toy
"model" (next-token logits = base[row, step] + coupling[last_token]) is
implemented twice — as a torch ``PreTrainedModel`` driven by the real HF
``generate`` beam search, and as a duck-typed stand-in for
``Seq2SeqModel`` driven by our jitted ``beam_search`` — and both must
produce identical beams, token for token, with matching normalized scores.

The coupling term makes logits genuinely prefix-dependent, so beam
divergence, reordering, EOS bookkeeping, and length normalization are all
exercised. Random tables make score ties measure-zero.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

BATCH = 3
BEAMS = 4
VOCAB = 12
MAXLEN = 9  # includes BOS position
BOS, EOS, PAD = 1, 2, 0


def _tables(seed=0):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(BATCH, MAXLEN, VOCAB)).astype(np.float32) * 2.0
    coupling = rng.normal(size=(VOCAB, VOCAB)).astype(np.float32)
    # keep specials from dominating arbitrarily: mild EOS pull at later steps
    base[:, :, PAD] = -8.0
    base[:, 4:, EOS] += 2.0
    return base, coupling


# --------------------------------------------------------------- HF side
class _TableConfig(transformers.PretrainedConfig):
    model_type = "table-toy"
    is_encoder_decoder = True

    def __init__(self, **kw):
        super().__init__(
            pad_token_id=PAD, bos_token_id=BOS, eos_token_id=EOS,
            decoder_start_token_id=BOS, **kw,
        )
        self.vocab_size = VOCAB


class _TableModel(transformers.PreTrainedModel, transformers.GenerationMixin):
    config_class = _TableConfig
    main_input_name = "input_ids"

    def __init__(self, config, base, coupling):
        super().__init__(config)
        self.register_buffer("base", torch.tensor(base))
        self.register_buffer("coupling", torch.tensor(coupling))
        # one (unused) parameter so PreTrainedModel device plumbing works
        self.dummy = torch.nn.Parameter(torch.zeros(1))

    def get_encoder(self):
        outer = self

        class Enc(torch.nn.Module):
            main_input_name = "input_ids"

            def forward(self, input_ids=None, attention_mask=None, **kw):
                b = input_ids.shape[0]
                return transformers.modeling_outputs.BaseModelOutput(
                    last_hidden_state=torch.zeros(
                        b, 1, 1, device=input_ids.device)
                )

        return Enc()

    def prepare_inputs_for_generation(self, decoder_input_ids, **kwargs):
        return {
            "decoder_input_ids": decoder_input_ids,
            "encoder_outputs": kwargs.get("encoder_outputs"),
        }

    def forward(self, input_ids=None, attention_mask=None,
                decoder_input_ids=None, encoder_outputs=None, **kw):
        rows, cur_len = decoder_input_ids.shape
        # beam-expanded row i belongs to original sample i // num_beams
        per_sample = rows // BATCH
        orig = torch.arange(rows, device=decoder_input_ids.device) // per_sample
        t = cur_len - 1  # predicting position t+1 from prefix of length t+1
        last = decoder_input_ids[:, -1]
        step_logits = self.base[orig, t] + self.coupling[last]
        logits = torch.full((rows, cur_len, VOCAB), -30.0,
                            device=decoder_input_ids.device)
        logits[:, -1, :] = step_logits
        return transformers.modeling_outputs.Seq2SeqLMOutput(logits=logits)


def _hf_decode(base, coupling, early_stopping="never"):
    model = _TableModel(_TableConfig(), base, coupling).eval()
    out = model.generate(
        input_ids=torch.full((BATCH, 1), BOS, dtype=torch.long),
        num_beams=BEAMS,
        num_return_sequences=BEAMS,
        max_length=MAXLEN,
        length_penalty=1.0,
        forced_eos_token_id=EOS,
        early_stopping=early_stopping,
        use_cache=False,
        do_sample=False,
        return_dict_in_generate=True,
        output_scores=True,
    )
    seqs = out.sequences.reshape(BATCH, BEAMS, -1).numpy()
    scores = out.sequences_scores.reshape(BATCH, BEAMS).numpy()
    # pad to MAXLEN for comparison (generate may stop earlier if every beam
    # is finished)
    if seqs.shape[-1] < MAXLEN:
        pad = np.full((BATCH, BEAMS, MAXLEN - seqs.shape[-1]), PAD, np.int64)
        seqs = np.concatenate([seqs, pad], axis=-1)
    return seqs, scores


# -------------------------------------------------------------- our side
class _FakeConfig:
    decoder_start_token_id = BOS
    eos_token_id = EOS
    pad_token_id = PAD
    d_model = 8
    decoder_attention_heads = 2
    kv_cache_dtype = "bfloat16"
    relative_position_bias = False
    use_beam_kernel = False
    compute_dtype = jnp.float32


class _FakeModel:
    """Duck-typed Seq2SeqModel: same logits table, trivial cache."""

    def __init__(self, base, coupling):
        self.config = _FakeConfig()
        self.base = jnp.asarray(base)
        self.coupling = jnp.asarray(coupling)

    def apply(self, variables, *args, method=None, **kw):
        name = getattr(method, "__name__", str(method))
        if name == "encode":
            enc_inputs, enc_mask = args[0], args[1]
            return jnp.zeros((enc_mask.shape[0], 1, 1))
        if name == "init_beam_cache":
            batch, beams, length, hidden = args[:4]
            return {"self": jnp.zeros((1,)), "cross": jnp.zeros((1,))}
        if name == "beam_decode_step":
            token_ids, position, cache, ancestry, enc_mask = args[:5]
            logits = (
                self.base[:, position][:, None, :]
                + self.coupling[token_ids]
            )  # (B, K, V)
            return logits, cache["self"]
        raise AssertionError(f"unexpected method {name}")


def _our_decode(base, coupling, stage_size):
    from multimodalanalytical_tpu.generation.beam_search import beam_search

    model = _FakeModel(base, coupling)
    seqs, scores = beam_search(
        model, {"params": {}},
        {"X": jnp.zeros((BATCH, 1), jnp.int32)},
        jnp.ones((BATCH, 1), bool),
        num_beams=BEAMS, max_length=MAXLEN, stage_size=stage_size,
    )
    return np.asarray(seqs), np.asarray(scores)


def _canon(seqs):
    """Zero out everything after the first EOS: HF's vectorized beam search
    fills finished rows with EOS while we pad with pad_token — both are
    stripped by ``skip_special_tokens`` downstream, so the convention is
    cosmetic. Tokens up to and including the first EOS must match exactly."""
    seqs = np.array(seqs, dtype=np.int64, copy=True)
    b, k, length = seqs.shape
    flat = seqs.reshape(-1, length)
    for row in flat:
        hits = np.flatnonzero(row == EOS)
        if hits.size:
            row[hits[0] + 1:] = PAD
    return flat.reshape(b, k, length)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
@pytest.mark.parametrize("stage_size", [None, 4])
def test_beam_search_matches_canonical_hf_generate(seed, stage_size):
    """Token-exact + score-exact parity with HF ``generate`` under
    ``early_stopping="never"`` — the CANONICAL beam search (stop only when
    no live beam can still beat the worst finished hypothesis), which is
    precisely the provably-safe early exit beam_search implements."""
    base, coupling = _tables(seed)
    hf_seqs, hf_scores = _hf_decode(base, coupling)
    our_seqs, our_scores = _our_decode(base, coupling, stage_size)
    np.testing.assert_array_equal(_canon(our_seqs), _canon(hf_seqs))
    np.testing.assert_allclose(our_scores, hf_scores, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_hf_default_heuristic_never_beats_us(seed):
    """The reference generates with HF's DEFAULT ``early_stopping=False`` —
    a heuristic that can stop before a longer, better hypothesis exists
    (its bound normalizes by the CURRENT length instead of max_length).
    Wherever the heuristic's output differs from ours, our hypothesis must
    score at least as well — the deviation is strictly favorable."""
    base, coupling = _tables(seed)
    hf_seqs, hf_scores = _hf_decode(base, coupling, early_stopping=False)
    our_seqs, our_scores = _our_decode(base, coupling, None)
    assert (our_scores >= hf_scores - 1e-5).all()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_greedy_matches_hf_greedy_search(seed):
    """greedy_decode (= beam_search with one beam) vs HF's separate
    greedy_search path (generate with num_beams=1)."""
    from multimodalanalytical_tpu.generation.beam_search import greedy_decode

    base, coupling = _tables(seed)
    model = _TableModel(_TableConfig(), base, coupling).eval()
    out = model.generate(
        input_ids=torch.full((BATCH, 1), BOS, dtype=torch.long),
        num_beams=1, max_length=MAXLEN, forced_eos_token_id=EOS,
        use_cache=False, do_sample=False,
    )
    hf = out.numpy()
    if hf.shape[-1] < MAXLEN:
        hf = np.concatenate(
            [hf, np.full((BATCH, MAXLEN - hf.shape[-1]), PAD, np.int64)], -1)

    ours = np.asarray(greedy_decode(
        _FakeModel(base, coupling), {"params": {}},
        {"X": jnp.zeros((BATCH, 1), jnp.int32)},
        jnp.ones((BATCH, 1), bool), max_length=MAXLEN,
    ))
    np.testing.assert_array_equal(
        _canon(ours[:, None, :])[:, 0], _canon(hf[:, None, :])[:, 0])
