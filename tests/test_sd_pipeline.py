"""Tokenizer and SD pipeline tests (tiny architecture-faithful models)."""

import numpy as np
import pytest

from onnxstream_tpu.models.sd.tokenizer import (
    BOS,
    COMMA,
    EOS,
    ClipTokenizer,
    apply_multipliers,
    parse_prompt_attention,
)


# ----------------------------------------------------------- prompt parsing
def test_prompt_attention_basic():
    assert parse_prompt_attention("a cat") == [("a cat", 1.0)]


def test_prompt_attention_weights():
    res = parse_prompt_attention("a (cat) and [dog]")
    d = dict(res)
    assert d["cat"] == pytest.approx(1.1)
    assert d["dog"] == pytest.approx(1 / 1.1)


def test_prompt_attention_nested():
    res = parse_prompt_attention("((very)) good")
    assert dict(res)["very"] == pytest.approx(1.21)


def test_prompt_attention_unclosed():
    res = parse_prompt_attention("a (cat")
    assert dict(res)["cat"] == pytest.approx(1.1)


def test_prompt_attention_merges_equal_weights():
    res = parse_prompt_attention("plain text here")
    assert len(res) == 1


# ----------------------------------------------------------------- tokenizer
def simple_tokenizer():
    vocab = {}
    words = ["a", "cat", "dog", "fluffy", "photo", "of"]
    for i, w in enumerate(words):
        vocab[w + "</w>"] = 100 + i
    vocab[",</w>"] = COMMA
    return ClipTokenizer(vocab, merges=None), vocab


def test_encode_chunks_shape():
    tok, vocab = simple_tokenizer()
    chunks = tok.encode_with_weights("a photo of a cat")
    assert len(chunks) == 1
    toks, mults = chunks[0]
    assert toks.shape == (77,) and mults.shape == (77,)
    assert toks[0] == BOS and toks[76] == EOS
    assert toks[1] == vocab["a</w>"]
    assert (mults == 1.0).all()


def test_encode_weighting():
    tok, vocab = simple_tokenizer()
    (toks, mults), = tok.encode_with_weights("a (cat)")
    assert mults[2] == pytest.approx(1.1)
    assert mults[1] == 1.0


def test_long_prompt_multiple_chunks():
    tok, vocab = simple_tokenizer()
    prompt = " ".join(["cat"] * 100)
    chunks = tok.encode_with_weights(prompt)
    assert len(chunks) == 2
    assert all(t.shape == (77,) for t, _ in chunks)


def test_comma_backtrack():
    tok, vocab = simple_tokenizer()
    # 74 tokens then a comma then more: the tail after the comma moves to chunk 2
    prompt = " ".join(["cat"] * 70) + " , " + " ".join(["dog"] * 10)
    chunks = tok.encode_with_weights(prompt)
    assert len(chunks) == 2
    toks2 = chunks[1][0]
    assert toks2[1] == vocab["dog</w>"]  # dogs relocated to the second chunk


def test_bpe_with_merges():
    vocab = {"c": 1, "a": 2, "t": 3, "ca": 4, "cat</w>": 5, "t</w>": 6, "ca t</w>": 7}
    merges = [("c", "a"), ("ca", "t</w>")]
    tok = ClipTokenizer(vocab, merges)
    assert tok.bpe("cat") == ["cat</w>"]
    assert tok.bpe("ct") == ["c", "t</w>"]


def test_apply_multipliers_preserves_mean():
    rng = np.random.RandomState(0)
    h = rng.randn(77, 16).astype(np.float32) + 0.3
    m = np.ones(77, np.float32)
    m[5] = 1.5
    out = apply_multipliers(h, m)
    assert abs(out.mean() - h.mean()) < 1e-4
    assert not np.allclose(out[5], h[5])


# ------------------------------------------------------------- pipeline E2E
@pytest.fixture(scope="module")
def tiny_pipe():
    from onnxstream_tpu.models.sd.pipeline import StableDiffusionPipeline

    return StableDiffusionPipeline.from_synthetic(tiny=True)


def test_generate_e2e(tiny_pipe):
    res = tiny_pipe.generate("a cat, (fluffy)", steps=3, seed=42, preview_steps=True)
    assert res.latents.shape == (4, 16, 16)
    assert np.isfinite(res.latents).all()
    assert res.image is not None and res.image.dtype == np.uint8
    assert len(res.previews) == 3


def test_generate_decode_steps(tiny_pipe):
    """--decode-steps: full VAE decode per step except the last (the final
    image covers it), reference src/sd.cpp:1745-1768."""
    res = tiny_pipe.generate("a cat", steps=3, seed=42, decode_steps=True)
    assert len(res.step_images) == 2
    for im in res.step_images:
        assert im.dtype == np.uint8 and im.shape == res.image.shape


def test_generate_reproducible(tiny_pipe):
    a = tiny_pipe.generate("a cat", steps=3, seed=7, decode=False)
    b = tiny_pipe.generate("a cat", steps=3, seed=7, decode=False)
    np.testing.assert_array_equal(a.latents, b.latents)
    c = tiny_pipe.generate("a cat", steps=3, seed=8, decode=False)
    assert np.abs(a.latents - c.latents).max() > 1e-6


def test_prompt_changes_output(tiny_pipe):
    a = tiny_pipe.generate("a cat", steps=2, seed=7, decode=False)
    b = tiny_pipe.generate("a dog", steps=2, seed=7, decode=False)
    assert np.abs(a.latents - b.latents).max() > 1e-6


def test_cfg_scale_matters(tiny_pipe):
    a = tiny_pipe.generate("a cat", steps=2, seed=7, cfg_scale=7.0, decode=False)
    b = tiny_pipe.generate("a cat", steps=2, seed=7, cfg_scale=1.0, decode=False)
    assert np.abs(a.latents - b.latents).max() > 1e-6


def test_latents_save_load(tiny_pipe, tmp_path):
    from onnxstream_tpu.models.sd.pipeline import StableDiffusionPipeline

    res = tiny_pipe.generate("a cat", steps=2, seed=3, decode=False)
    p = str(tmp_path / "latents.bin")
    StableDiffusionPipeline.save_latents(p, res.latents)
    back = StableDiffusionPipeline.load_latents(p, 16, 16)
    np.testing.assert_array_equal(res.latents, back)
    img = tiny_pipe.decode(back)
    assert img.dtype == np.uint8


def test_tiled_decode(tiny_pipe):
    rng = np.random.RandomState(0)
    lat = rng.randn(4, 16, 16).astype(np.float32)
    full = tiny_pipe.decode(lat)
    tiled = tiny_pipe._decode_tiled(lat, tile=8, stride=6, ramp=4)
    assert tiled.shape == full.shape
    # interiors agree; tile borders differ due to conv padding (expected —
    # the reference accepts the same artifact, README.md:74-88)
    c = full.shape[0] // 2
    assert np.abs(tiled[c - 2 : c + 2, c - 2 : c + 2].astype(int) - full[c - 2 : c + 2, c - 2 : c + 2].astype(int)).mean() < 60


def test_sd_cli_synthetic(tmp_path):
    from onnxstream_tpu.cli.sd_main import main

    out = str(tmp_path / "img.png")
    rc = main([
        "--synthetic", "tiny", "--steps", "2", "--seed", "5", "--prompt", "a cat",
        "--output", out, "--compute-dtype", "float32", "--embed-parameters",
    ])
    assert rc == 0
    from PIL import Image

    im = Image.open(out)
    assert im.size[0] > 0
    assert "a cat" in (im.text or {}).get("parameters", "")


def test_sd_cli_latents_roundtrip(tmp_path):
    from onnxstream_tpu.cli.sd_main import main

    lat = str(tmp_path / "l.bin")
    out = str(tmp_path / "img.png")
    rc = main(["--synthetic", "tiny", "--steps", "2", "--save-latents", lat,
               "--compute-dtype", "float32", "--output", out])
    assert rc == 0
    rc = main(["--synthetic", "tiny", "--decode-latents", lat, "--output", out,
               "--compute-dtype", "float32"])
    assert rc == 0
    import os

    assert os.path.exists(out)


# ------------------------------------------------------------------- SDXL
@pytest.fixture(scope="module")
def tiny_xl_pipe():
    from onnxstream_tpu.models.sd.pipeline import StableDiffusionPipeline

    return StableDiffusionPipeline.from_synthetic(tiny=True, xl=True)


def test_sdxl_encode_prompt(tiny_xl_pipe):
    emb = tiny_xl_pipe.encode_prompt_xl("a photo of a cat")
    # context = concat of te1 (32) and te2 (48) penultimate states
    assert emb["context"].shape == (7, 80)
    assert emb["pooled"].shape == (1, 48)


def test_sdxl_generate_e2e(tiny_xl_pipe):
    r = tiny_xl_pipe.generate("a photo of a cat", steps=2, seed=11, preview_steps=True)
    assert r.latents.shape == (4, 16, 16)
    assert r.image is not None and r.image.dtype == np.uint8
    assert len(r.previews) == 2


def test_sdxl_cfg_uses_per_branch_pooled(tiny_xl_pipe):
    # cond and uncond carry different pooled embeds -> CFG must differ from
    # the cond-only result (reference sd.cpp:1500-1516)
    a = tiny_xl_pipe.generate("a photo of a cat", steps=2, seed=11).latents
    b = tiny_xl_pipe.generate("a photo of a cat", neg_prompt="a dog", steps=2, seed=11).latents
    assert np.abs(a - b).max() > 1e-6


def test_sdxl_turbo_skips_uncond():
    from onnxstream_tpu.models.sd.pipeline import StableDiffusionPipeline

    p = StableDiffusionPipeline.from_synthetic(tiny=True, xl=True, turbo=True)
    r = p.generate("a cat", steps=1, seed=3)
    assert r.latents.shape == (4, 16, 16)
    # turbo ignores the negative prompt entirely
    r2 = p.generate("a cat", neg_prompt="ugly", steps=1, seed=3)
    assert np.array_equal(r.latents, r2.latents)


def test_sdxl_vae_scale_differs(tiny_xl_pipe, tiny_pipe):
    assert tiny_xl_pipe.vae_scale != tiny_pipe.vae_scale


def test_sdxl_cli(tmp_path):
    from onnxstream_tpu.cli.sd_main import main

    out = str(tmp_path / "xl.png")
    rc = main(["--synthetic", "tiny", "--xl", "--turbo", "--steps", "1",
               "--prompt", "a cat", "--output", out, "--compute-dtype", "float32"])
    assert rc == 0
    import os

    assert os.path.exists(out)


# ------------------------------------------------------- batched generation
def test_generate_batch_matches_sequential():
    from onnxstream_tpu.models.sd.pipeline import StableDiffusionPipeline

    seq = StableDiffusionPipeline.from_synthetic(tiny=True)
    bat = StableDiffusionPipeline.from_synthetic(tiny=True, batch=2)
    prompts = ["a photo of a cat", "a dog"]
    seeds = [7, 11]
    r_seq = [seq.generate(p, steps=2, seed=s, decode=False) for p, s in zip(prompts, seeds)]
    r_bat = bat.generate_batch(prompts, steps=2, seeds=seeds, decode=False)
    for a, b in zip(r_seq, r_bat):
        # batch-1 and batch-2 are separately compiled fp32 programs: XLA may
        # reassociate the packed-attention einsums differently, giving ~7e-5
        # absolute noise on latents of magnitude ~60 (measured; 4/1024
        # elements near zero exceeded atol=2e-5)
        np.testing.assert_allclose(a.latents, b.latents, rtol=2e-4, atol=2e-4)


def test_generate_batch_multistage_sampler():
    """heun's second-stage denoiser calls go through the barrier-coordinated
    batched path (one UNet pass per call site, not one per image); each
    image must still match its sequential run."""
    from onnxstream_tpu.models.sd.pipeline import StableDiffusionPipeline

    bat = StableDiffusionPipeline.from_synthetic(tiny=True, batch=2)
    prompts = ["a cat", "a dog"]
    calls = []
    orig = bat._denoise_batch

    def counting(xb, s, conds, unconds, cfg):
        calls.append(float(s))
        return orig(xb, s, conds, unconds, cfg)

    bat._denoise_batch = counting
    r = bat.generate_batch(prompts, steps=2, seeds=[1, 2], sampler="heun", decode=False)
    assert len(r) == 2 and r[0].latents.shape == (4, 16, 16)
    assert not np.allclose(r[0].latents, r[1].latents)
    # heun: 1 first-stage + 1 COORDINATED second-stage batched pass per step
    # (the last step's dt->0 leg is single-stage) — the old tile-per-image
    # shape cost 1 + N passes per multi-stage step
    assert len(calls) == 3, calls
    # sequential sanity: batch-1 vs batch-2 are separately compiled programs
    # whose fp32 noise heun amplifies through d=(x-den)/sigma at small
    # sigma; ~1e-2 absolute on latents of magnitude ~60 (measured)
    seq = StableDiffusionPipeline.from_synthetic(tiny=True)
    r_seq = [seq.generate(p, steps=2, seed=s, sampler="heun", decode=False)
             for p, s in zip(prompts, [1, 2])]
    for a, b in zip(r_seq, r):
        np.testing.assert_allclose(a.latents, b.latents, rtol=5e-2, atol=5e-2)


def test_generate_batch_wrong_batch_raises():
    from onnxstream_tpu.models.sd.pipeline import StableDiffusionPipeline

    p = StableDiffusionPipeline.from_synthetic(tiny=True)
    with pytest.raises(ValueError):
        p.generate_batch(["a", "b"], steps=1, decode=False)


# ----------------------------------------------------- on-device diffusion
def test_generate_on_device_matches_host(tiny_pipe):
    a = tiny_pipe.generate("a photo of a cat", steps=3, seed=7, decode=False)
    b = tiny_pipe.generate_on_device("a photo of a cat", steps=3, seed=7, decode=False)
    np.testing.assert_allclose(b.latents, a.latents, rtol=3e-4, atol=3e-4)
    # euler too (turbo-reshaped sigma path is host math either way)
    a2 = tiny_pipe.generate("a cat", steps=2, seed=9, sampler="euler", decode=False)
    b2 = tiny_pipe.generate_on_device("a cat", steps=2, seed=9, sampler="euler", decode=False)
    np.testing.assert_allclose(b2.latents, a2.latents, rtol=3e-4, atol=3e-4)


def test_generate_on_device_unsupported_sampler(tiny_pipe):
    with pytest.raises(ValueError):
        tiny_pipe.generate_on_device("a", sampler="heun")


def test_generate_on_device_xl_turbo():
    from onnxstream_tpu.models.sd.pipeline import StableDiffusionPipeline

    q = StableDiffusionPipeline.from_synthetic(tiny=True, xl=True, turbo=True)
    c = q.generate("a cat", steps=2, seed=3, decode=False)
    d = q.generate_on_device("a cat", steps=2, seed=3, decode=False)
    np.testing.assert_allclose(d.latents, c.latents, rtol=3e-4, atol=3e-4)


def test_generate_batch_xl():
    """Batched SDXL UNet builds and matches sequential (review finding: the
    resblock time projection hardcoded batch 1)."""
    from onnxstream_tpu.models.sd.pipeline import StableDiffusionPipeline

    bat = StableDiffusionPipeline.from_synthetic(tiny=True, xl=True, batch=2)
    seq = StableDiffusionPipeline.from_synthetic(tiny=True, xl=True)
    prompts = ["a photo of a cat", "a dog"]
    r_bat = bat.generate_batch(prompts, steps=2, seeds=[7, 11], decode=False)
    r_seq = [seq.generate(p, steps=2, seed=s, decode=False) for p, s in zip(prompts, [7, 11])]
    for a, b in zip(r_seq, r_bat):
        np.testing.assert_allclose(b.latents, a.latents, rtol=5e-3, atol=1e-4)
