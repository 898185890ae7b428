"""Text-pretext extensions (train/pretext.py + mlm.py wiring): corpus
augmentation, whole-number corruption, cross-modal CLIP distillation."""
import numpy as np
import jax
import jax.numpy as jnp

from eeg_multimodal_tpu.train import pretext
from eeg_multimodal_tpu.train import mlm as M
from eeg_multimodal_tpu.models import bert as B

TINY = B.BertConfig(
    vocab_size=40, hidden_size=64, num_layers=1, num_heads=4,
    intermediate_size=64, max_position_embeddings=16,
)


def test_augment_rows_shapes_and_dtype():
    rows = np.arange(20, dtype=np.float64).reshape(4, 5)
    aug = pretext.augment_rows(rows, factor=3, jitter_frac=0.1, seed=0)
    assert aug.shape == (12, 5)
    # integer-valued (reference rounds features to int)
    np.testing.assert_array_equal(aug, np.rint(aug))
    # zero factor -> empty
    assert pretext.augment_rows(rows, 0, 0.1, 0).shape == (0, 5)
    # constant column stays constant (std 0 -> no noise)
    rows2 = np.ones((6, 3))
    aug2 = pretext.augment_rows(rows2, 2, 0.5, 1)
    np.testing.assert_array_equal(aug2, np.ones((12, 3)))


def test_word_start_index_groups_continuations():
    cont = np.zeros(10, bool)
    cont[[7, 8]] = True  # ids 7, 8 are '##' pieces
    ids = np.array([[2, 5, 7, 8, 5, 7, 0, 0]])
    ws = pretext.word_start_index(ids, cont)
    # 5 at pos1 starts a word; 7,8 continue it; 5 at pos4 starts; 7 continues
    np.testing.assert_array_equal(ws, [[0, 1, 1, 1, 4, 4, 6, 7]])


def test_whole_word_masking_is_atomic():
    """Every piece of a word must share one corruption decision."""
    cfg = M.MLMConfig(mask_prob=0.5, mask_token_frac=1.0,
                      random_token_frac=0.0, whole_word=True,
                      mask_id=3, cls_id=1, sep_id=2, pad_id=0)
    # row: [CLS] w(4) c(5) c(5) w(6) c(5) [SEP]
    ids = jnp.asarray([[1, 4, 5, 5, 6, 5, 2, 0]])
    mask = jnp.asarray([[1, 1, 1, 1, 1, 1, 1, 0]])
    ws = jnp.asarray([[0, 1, 1, 1, 4, 4, 6, 7]])
    hits = 0
    for i in range(20):
        corrupted, labels, selected = M.mask_tokens(
            jax.random.PRNGKey(i), ids, mask, cfg, 40, word_start=ws
        )
        sel = np.asarray(selected[0])
        # pieces 1-3 are one word, 4-5 another: decisions must be atomic
        assert sel[1] == sel[2] == sel[3]
        assert sel[4] == sel[5]
        assert not sel[0] and not sel[6] and not sel[7]  # specials/pad
        hits += int(sel[1])
    assert 0 < hits < 20  # p=0.5: both outcomes occur


def test_mlm_loss_with_clip_and_whole_word_runs():
    cfg = M.MLMConfig(whole_word=True, clip_weight=0.5, row_reg_weight=0.0,
                      mask_id=3, cls_id=1, sep_id=2, pad_id=0)
    key = jax.random.PRNGKey(0)
    bert_p = B.init(key, TINY)
    head = M.head_init(key, TINY, n_clip=8)
    ids = jax.random.randint(key, (2, 12), 4, 40)
    mask = jnp.ones((2, 12), jnp.int32)
    ws = jnp.tile(jnp.arange(12), (2, 1))
    tgt = jax.random.normal(key, (2, 8))

    def loss_fn(bp):
        return M.mlm_loss(bp, head, ids, mask, TINY, cfg, key,
                          word_start=ws, clip_targets=tgt)

    l, g = jax.value_and_grad(loss_fn)(bert_p)
    assert np.isfinite(float(l))
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    # clip loss engages: zero weight changes the loss
    cfg0 = M.MLMConfig(whole_word=True, clip_weight=0.0,
                       mask_id=3, cls_id=1, sep_id=2, pad_id=0)
    l0 = M.mlm_loss(bert_p, head, ids, mask, TINY, cfg0, key,
                    word_start=ws, clip_targets=None)
    assert abs(float(l) - float(l0)) > 1e-6


def test_stack_clip_targets_alignment():
    clip = np.arange(12, dtype=np.float32).reshape(4, 3)
    # two modalities, each 4 base + 4 augmented rows
    out = pretext.stack_clip_targets([8, 8], clip)
    assert out.shape == (16, 3)
    np.testing.assert_array_equal(out[:4], clip)
    np.testing.assert_array_equal(out[4:8], clip)  # aug copy 1, same order
    np.testing.assert_array_equal(out[8:12], clip)


def test_tokenize_rows_matches_embedding_pipeline():
    rows = np.array([[14, -2, 7], [3, 0, -2084]])
    out = pretext.tokenize_rows(rows, max_len=32)
    assert out["input_ids"].shape == (2, 32)
    # row 0 and row 1 differ; both start with [CLS]
    assert out["input_ids"][0, 0] == out["input_ids"][1, 0]
    assert (out["attention_mask"].sum(axis=1) > 2).all()
    # identical rows tokenize identically
    out2 = pretext.tokenize_rows(rows.copy(), max_len=32)
    np.testing.assert_array_equal(out["input_ids"], out2["input_ids"])
