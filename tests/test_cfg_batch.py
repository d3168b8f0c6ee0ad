"""Host-loop CFG batching: a batch-2 UNet session runs cond+uncond in ONE
call per step (pipeline._denoise_cfg2) and must be bit-identical to the
two-sequential-runs path (reference src/sd.cpp:1519-1556 runs them
sequentially; the MXU-native form batches them)."""

import numpy as np

from onnxstream_tpu.models.sd.pipeline import StableDiffusionPipeline


def _gen(batch: int, **kw):
    pipe = StableDiffusionPipeline.from_synthetic(tiny=True, batch=batch, **kw)
    return pipe, pipe.generate(
        "a photo of a cat", neg_prompt="blurry", steps=3, seed=7,
        sampler="euler_a", decode=False,
    )


def test_cfg2_latents_match_sequential():
    _, r1 = _gen(batch=1)
    pipe2, r2 = _gen(batch=2)
    # same synthetic weights (seed-deterministic builders, batch only changes
    # input shapes), same RNG. The batch-2 program legitimately reassociates
    # fp32 accumulations vs the batch-1 program and CFG scale 7 amplifies it
    # over steps, so parity is near-exact, not bitwise.
    assert pipe2._unet_batch() == 2
    np.testing.assert_allclose(r2.latents, r1.latents, rtol=2e-3, atol=1e-3)
    assert float(np.abs(r2.latents - r1.latents).mean()) < 1e-3 * float(
        np.abs(r1.latents).mean()
    )


def test_cfg2_xl_branch_stacking():
    both = StableDiffusionPipeline._stack_branches(
        {"context": np.ones((77, 8), np.float32), "pooled": np.full((1, 4), 2.0, np.float32)},
        {"context": np.zeros((77, 8), np.float32), "pooled": np.full((1, 4), 3.0, np.float32)},
    )
    assert both["context"].shape == (2, 77, 8)
    assert both["pooled"].shape == (2, 4)
    assert both["context"][0].max() == 1.0 and both["context"][1].max() == 0.0
    assert both["pooled"][0, 0] == 2.0 and both["pooled"][1, 0] == 3.0
