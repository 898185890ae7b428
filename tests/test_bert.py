"""Golden-value test: our JAX BERT vs HF torch BertModel (random weights).

Constructs a torch BertModel from config (offline — no download), imports its
state dict through our adapter, and checks (sequence_output, pooled_output)
parity in eval mode. This pins the exact semantics the reference relies on at
models.py:40,59-61.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from eeg_multimodal_tpu.models import bert as B

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def small_config():
    return dict(
        vocab_size=100,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        type_vocab_size=2,
    )


def our_config():
    return B.BertConfig(
        vocab_size=100,
        hidden_size=32,
        num_layers=2,
        num_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
    )


def test_bert_matches_hf_torch():
    torch.manual_seed(0)
    hf_cfg = transformers.BertConfig(**small_config())
    model = transformers.BertModel(hf_cfg)
    model.eval()

    rng = np.random.RandomState(0)
    input_ids = rng.randint(0, 100, size=(3, 16))
    mask = np.ones((3, 16), dtype=np.int64)
    mask[0, 10:] = 0
    mask[2, 5:] = 0

    with torch.no_grad():
        seq_t, pooled_t = model(
            input_ids=torch.from_numpy(input_ids),
            attention_mask=torch.from_numpy(mask),
            return_dict=False,
        )

    params = B.from_torch_state_dict(model.state_dict(), our_config())
    seq_j, pooled_j = B.apply(
        params, jnp.asarray(input_ids), jnp.asarray(mask), our_config()
    )
    # torch CPU runs under oneDNN with different reduction orders; observed
    # divergence is ~2e-4 absolute over 2 layers — structural errors are
    # orders of magnitude larger.
    np.testing.assert_allclose(np.asarray(seq_j), seq_t.numpy(), rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(pooled_j), pooled_t.numpy(), rtol=1e-3, atol=2e-3)


def test_state_dict_round_trip():
    import jax

    params = B.init(jax.random.PRNGKey(0), our_config())
    sd = B.to_torch_state_dict(params)
    params2 = B.from_torch_state_dict(sd, our_config())
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hf_state_dict_loads_into_base_config():
    """The adapter accepts a full-size HF BertModel state dict layout."""
    torch.manual_seed(0)
    hf_cfg = transformers.BertConfig()  # bert-base shape
    model = transformers.BertModel(hf_cfg)
    params = B.from_torch_state_dict(model.state_dict(), B.BertConfig())
    assert params["embeddings"]["word"].shape == (30522, 768)
    assert len(params["layers"]) == 12
