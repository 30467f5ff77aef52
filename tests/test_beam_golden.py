"""Golden-value regression of beam-search decode semantics (VERDICT r1 #3).

A fixed-seed flagship model decodes a fixed batch; the resulting beam
rankings and scores are checked in as golden data. Any change to decode
semantics (cache math, hook ordering, forced EOS, length normalization,
staging) that alters results breaks this test. Regenerate deliberately with
`python tests/test_beam_golden.py` after an intentional semantics change.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# Standalone regeneration must not hit the TPU: the axon sitecustomize
# force-sets jax_platforms at interpreter start, so update the config
# explicitly (the env var alone is ignored — see CLAUDE.md).
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

GOLDEN = Path(__file__).parent / "golden" / "beam_golden.npz"


def _decode():
    from __graft_entry__ import _example_batch, _flagship
    from multimodalanalytical_tpu.generation.beam_search import beam_search

    model = _flagship(d_model=64, layers=2, ffn=128, vocab=24)
    batch = _example_batch(batch=4, target_len=10, vocab=24)
    variables = model.init(
        jax.random.PRNGKey(7), batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        deterministic=True,
    )
    seqs, scores = beam_search(
        model, variables, batch["encoder_inputs"],
        jnp.asarray(batch["encoder_mask"]), num_beams=5, max_length=16,
    )
    return np.asarray(seqs), np.asarray(scores)


def test_beam_decode_matches_golden():
    seqs, scores = _decode()
    golden = np.load(GOLDEN)
    np.testing.assert_array_equal(seqs, golden["seqs"])
    np.testing.assert_allclose(scores, golden["scores"], rtol=1e-4, atol=1e-5)


if __name__ == "__main__":
    seqs, scores = _decode()
    GOLDEN.parent.mkdir(exist_ok=True)
    np.savez(GOLDEN, seqs=seqs, scores=scores)
    print(f"wrote {GOLDEN}: seqs {seqs.shape} scores {scores.shape}")
