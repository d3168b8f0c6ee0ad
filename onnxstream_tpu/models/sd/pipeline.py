"""Stable Diffusion pipeline: prompts -> latents -> image.

Mirrors the reference application flow (src/sd.cpp):

  * prompt_solve: per-77-token-chunk text encoder runs with A1111 weighting
    and mean renormalization (sd.cpp:2035-2230);
  * diffusion loop: CompVis CFG denoiser (c_in/c_out scalings, sigma_to_t,
    eps -> denoised, uncond + scale*(cond-uncond); turbo skips uncond)
    (sd.cpp:1397-1558), any of the 22 samplers;
  * latents save/decode (--save-latents/--decode-latents, sd.cpp:2325-2328,
    3212-3261) and per-step previews via the 4x3 latent->RGB projection
    (sd.cpp:910-1029);
  * VAE decode: plain (1/0.18215 scaling) or tiled 32x32->256x256 with
    64-pixel linear blend ramps (sd.cpp:1258-1346, 2357-2517);
  * N-image generation: the reference interleaves N coroutines over a batch
    replay (sd.cpp:1031-1161); here images run sequentially with incrementing
    seeds (a real batch dimension is the TPU-native path for throughput).

Where the reference reads converted ONNX graphs from disk, this pipeline runs
any Session — from_dir() loads the reference's directory layout, while
from_synthetic() builds architecture-faithful graphs with random weights for
tests and benchmarks.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from onnxstream_tpu.models.sd import samplers as S
from onnxstream_tpu.models.sd import scheduler as sched
from onnxstream_tpu.models.sd.rng import randn_4_w_h
from onnxstream_tpu.models.sd.tokenizer import ClipTokenizer, apply_multipliers
from onnxstream_tpu.runtime.config import SessionConfig
from onnxstream_tpu.runtime.session import Session
from onnxstream_tpu.runtime.weights import DictWeightsProvider

SD_LATENT_RGB_PROJ = np.array(
    [
        [0.3512, 0.2297, 0.3227],
        [0.3250, 0.4974, 0.2350],
        [-0.2829, 0.1762, 0.2721],
        [-0.2120, -0.2616, -0.7177],
    ],
    np.float32,
)

# reference sdxl_preview (src/sd.cpp:975-979, from ComfyUI latent_formats)
SDXL_LATENT_RGB_PROJ = np.array(
    [
        [0.3651, 0.4232, 0.4341],
        [-0.2533, -0.0042, 0.1068],
        [0.1076, 0.1111, -0.0362],
        [-0.3165, -0.2492, -0.2188],
    ],
    np.float32,
)

SDXL_TIME_IDS = np.array([[1024, 1024, 0, 0, 1024, 1024]], np.float32)
VAE_SCALE = 0.18215  # 1/5.48998 (reference src/sd.cpp:2359)
VAE_SCALE_XL = 0.13025  # 1/7.67754 (reference src/sd.cpp:2360)


@dataclasses.dataclass
class GenerationResult:
    image: Optional[np.ndarray]  # (H, W, 3) uint8
    latents: np.ndarray  # (4, h, w) float32
    previews: List[np.ndarray]
    # full per-step VAE decodes (--decode-steps, reference src/sd.cpp:1745-1768)
    step_images: List[np.ndarray] = dataclasses.field(default_factory=list)


def _device_branch(branch):
    """Move a CFG branch's loop-invariant tensors (context / pooled embeds)
    to the device once; Session.add_tensor passes jax arrays through, so the
    per-step denoise uploads only the latent instead of ~0.5 MB of context
    every step (docs/tpu_notes.md on tunneled-link costs)."""
    if branch is None:
        return None
    try:
        import jax

        if isinstance(branch, dict):
            return {k: jax.device_put(np.asarray(v, np.float32)) for k, v in branch.items()}
        return jax.device_put(np.asarray(branch, np.float32))
    except Exception:
        return branch


def latent_to_rgb(sample: np.ndarray, proj: np.ndarray = SD_LATENT_RGB_PROJ) -> np.ndarray:
    """(4,h,w) latents -> (h,w,3) uint8 preview (reference sd_preview,
    src/sd.cpp:910-1029)."""
    rgb = np.einsum("chw,ck->hwk", sample.astype(np.float32), proj)
    rgb = (rgb + 1.0) * 127.5
    return np.clip(rgb, 0, 255).astype(np.uint8)


def upscale8x(img: np.ndarray) -> np.ndarray:
    return np.repeat(np.repeat(img, 8, axis=0), 8, axis=1)


class StableDiffusionPipeline:
    def __init__(
        self,
        text_encoder: Session,
        unet: Session,
        vae_decoder: Optional[Session],
        tokenizer: ClipTokenizer,
        latent_hw: Tuple[int, int] = (64, 64),
        context_dim: int = 768,
        turbo: bool = False,
        vae_tile_session: Optional[Session] = None,
        text_encoder_2: Optional[Session] = None,
        xl: bool = False,
    ):
        self.text_encoder = text_encoder
        self.text_encoder_2 = text_encoder_2
        self.unet = unet
        self.vae_decoder = vae_decoder
        self.vae_tile_session = vae_tile_session
        self.tokenizer = tokenizer
        self.lath, self.latw = latent_hw
        self.context_dim = context_dim
        self.turbo = turbo
        self.xl = xl
        self.vae_scale = VAE_SCALE_XL if xl else VAE_SCALE

    # ----------------------------------------------------------- constructors
    @classmethod
    def from_synthetic(cls, tiny: bool = True, seed: int = 0, compute_dtype: str = "float32",
                       xl: bool = False, turbo: bool = False, batch: int = 1,
                       on_device: bool = False):
        """Architecture-faithful graphs with random weights (tests/bench).

        on_device=True: the UNet's weights stay LazyArray placeholders and
        every session device-synthesizes its big float weights
        (SessionConfig.synthetic_device_weights) — the full-size SDXL UNet
        (2.6B params, ~10 GB f32) never materializes on the host and nothing
        big crosses the tunneled link. Timing-valid, numerically meaningless
        (same contract as the LLM bench path, models/llm/pipeline.py)."""
        from onnxstream_tpu.models.sd.clip import (
            CLIP_BIGG,
            CLIP_L,
            CLIP_TINY,
            CLIP_TINY_G,
            build_text_encoder,
        )
        from onnxstream_tpu.models.sd.unet import SD15, SDXL, TINY, TINY_XL, build_unet
        from onnxstream_tpu.models.sd.vae import VAE_SD, VAE_TINY, build_vae_decoder

        if xl:
            ccfg = CLIP_TINY if tiny else CLIP_L
            ccfg2 = CLIP_TINY_G if tiny else CLIP_BIGG
            ucfg = TINY_XL if tiny else SDXL
        else:
            ccfg = CLIP_TINY if tiny else CLIP_L
            ccfg2 = None
            ucfg = TINY if tiny else SD15
        vcfg = VAE_TINY if tiny else VAE_SD

        def mk(builder):
            s = Session(
                config=SessionConfig(compute_dtype=compute_dtype, fuse_ops_in_attention=True,
                                     synthetic_device_weights=on_device),
                weights_provider=DictWeightsProvider(builder.weights),
            )
            s.read_string(builder.to_text())
            return s

        te = mk(build_text_encoder(ccfg, seed=seed, lazy_weights=on_device))
        te2 = (mk(build_text_encoder(ccfg2, seed=seed + 7, lazy_weights=on_device))
               if ccfg2 else None)
        un = mk(build_unet(ucfg, batch=batch, seed=seed + 1, lazy_weights=on_device))
        lat = ucfg.sample_size
        vd = mk(build_vae_decoder(dataclasses.replace(vcfg, sample=lat), seed=seed + 2,
                                  lazy_weights=on_device))
        # tile decoder: same weights (identical builder stream), tile-sized
        # input — the synthetic analog of the reference's *_l32 model
        tile_sz = max(lat // 2, 4)
        vt = mk(build_vae_decoder(dataclasses.replace(vcfg, sample=tile_sz), seed=seed + 2,
                                  lazy_weights=on_device))
        # tiny test vocab: a-z single letters plus common words (ids < 1000)
        vocab = {chr(ord("a") + i) + "</w>": 10 + i for i in range(26)}
        for i, w in enumerate(["cat", "dog", "photo", "of", "fluffy", "horse", "astronaut", "riding", "mars", "on", "the", "an"]):
            vocab[w + "</w>"] = 40 + i
        vocab[",</w>"] = 267
        tok = ClipTokenizer(vocab, merges=None)
        pipe = cls(te, un, vd, tok, latent_hw=(lat, lat), context_dim=ucfg.cross_attention_dim,
                   vae_tile_session=vt, text_encoder_2=te2, xl=xl, turbo=turbo)
        pipe._tile_size = tile_sz
        pipe._clip_seq = ccfg.seq
        return pipe

    @classmethod
    def from_dir(
        cls,
        path: str,
        xl: bool = False,
        turbo: bool = False,
        compute_dtype: str = "bfloat16",
        res: Tuple[int, int] = (512, 512),
        provider: str = "ram+prefetch",
        hbm_budget_bytes: int = 0,
    ):
        """Reference model-directory layout (sd.cpp model folders):
        text_encoder_fp32/, unet_fp16/, vae_decoder_fp16/ + tokenizer files."""

        def mk(sub, dynamic=False):
            p = os.path.join(path, sub, "model.txt")
            if not os.path.exists(p):
                return None
            cfg = SessionConfig(
                compute_dtype=compute_dtype,
                fuse_ops_in_attention=True,
                support_dynamic_shapes=dynamic,
                hbm_budget_bytes=hbm_budget_bytes,
            )
            # calibrated quantized decoder: load ranges and enable W8A8
            # (reference decoder_solver, src/sd.cpp:1214-1241)
            ranges = os.path.join(path, sub, "range_data.txt")
            if sub.endswith("_qu8") and os.path.exists(ranges):
                from onnxstream_tpu.runtime.quantization import RangeData

                cfg.range_data = RangeData.read(ranges).data
                cfg.use_uint8_arithmetic = True
            s = Session(config=cfg, weights_provider_name=provider)
            s.read_file(p)
            return s

        if xl:
            # reference SDXL folder names (src/sd.cpp:2586-2587, 1676-1680,
            # 2379-2434, 3040-3046)
            te = mk("sdxl_text_encoder_1_fp32")
            te2 = mk("sdxl_text_encoder_2_fp32")
            un = mk("sdxl_unet_fp16") or mk("sdxl_unet_anyshape_fp16", dynamic=True)
            vd = mk("sdxl_vae_decoder_fp16") or mk("sdxl_vae_decoder_anyshape_fp16", dynamic=True)
            tile = mk("sdxl_vae_decoder_32x32_fp16")
            # penultimate hidden states come via extra outputs (sd.cpp:2597-2601)
            if te is not None:
                te.add_extra_output("out_5F_13")
            if te2 is not None:
                te2.add_extra_output("out_5F_33")
            tok_dir = os.path.join(path, "sdxl_tokenizer")
        else:
            te, te2 = mk("text_encoder_fp32"), None
            un = mk("unet_fp16") or mk("unet_fp32")
            vd = mk("vae_decoder_fp16") or mk("vae_decoder_qu8") or mk("vae_decoder_fp32")
            tile = mk("vae_decoder_fp16_l32")
            tok_dir = os.path.join(path, "tokenizer")
        tok = ClipTokenizer.from_dir(tok_dir) if os.path.exists(tok_dir) else ClipTokenizer.from_dir(path)
        lat = (res[1] // 8, res[0] // 8)
        return cls(te, un, vd, tok, latent_hw=lat, context_dim=2048 if xl else 768,
                   turbo=turbo, vae_tile_session=tile, text_encoder_2=te2, xl=xl)

    # -------------------------------------------------------------- prompts
    _clip_seq = 77

    def encode_prompt(self, prompt: str) -> np.ndarray:
        """(77, d) conditioning for one prompt (last chunk on multi-chunk
        prompts, matching reference behavior sd.cpp:2216-2218)."""
        chunks = self.tokenizer.encode_with_weights(prompt)
        cond = None
        for toks, mults in chunks:
            toks = toks.copy()
            toks[76] = 49407  # reference sd.cpp:2175 ("todo")
            L = self._clip_seq
            if L != 77:  # tiny test configs use a shorter context
                toks = toks[:L].copy()
                mults = mults[:L]
            if self.text_encoder is None:
                raise RuntimeError("no text encoder loaded")
            self.text_encoder.clear_tensors()
            name = next(iter(self.text_encoder.graph.inputs))
            if L != 77:
                toks = np.remainder(toks, 999)
            self.text_encoder.add_tensor(name, toks.reshape(1, L))
            out = self.text_encoder.run()
            hidden = next(v for k, v in out.items() if v.ndim == 3)
            hidden = hidden.reshape(L, -1)
            cond = apply_multipliers(hidden, np.asarray(mults, np.float32))
        return cond

    def encode_prompt_xl(self, prompt: str) -> Dict[str, np.ndarray]:
        """SDXL dual-encoder conditioning (reference src/sd.cpp:2543-2663):
        raw tokens (no weighting) through both encoders; context is the
        per-token concat of the penultimate hidden states (768+1280 -> 2048);
        pooled comes from encoder 2."""
        toks, _ = self.tokenizer.encode_with_weights(prompt)[-1]
        L = self._clip_seq
        if L != 77:
            toks = np.remainder(toks[:L], 999)
        toks = toks.reshape(1, L).astype(np.int64)

        def run(sess):
            sess.clear_tensors()
            name = next(iter(sess.graph.inputs))
            sess.add_tensor(name, toks)
            return sess.run()

        o1 = run(self.text_encoder)
        o2 = run(self.text_encoder_2)

        def pick(out, names, ndim):
            # converted graphs use out_5F_13/out_5F_33 (penultimate, pulled via
            # extra_outputs) and out_5F_0 (pooled); synthetic graphs use the
            # builder's named outputs
            for n in names:
                if n in out:
                    return out[n]
            return next(v for v in out.values() if np.asarray(v).ndim == ndim)

        h1 = pick(o1, ("penultimate_hidden_state", "out_5F_13"), 3)
        h2 = pick(o2, ("penultimate_hidden_state", "out_5F_33"), 3)
        pooled = pick(o2, ("pooled_output", "out_5F_0"), 2)
        context = np.concatenate(
            [np.asarray(h1, np.float32)[0], np.asarray(h2, np.float32)[0]], axis=-1
        )
        return {"context": context, "pooled": np.asarray(pooled, np.float32).reshape(1, -1)}

    # -------------------------------------------------------------- denoiser
    def _unet_input_names(self) -> Dict[str, str]:
        names = {}
        for n, spec in self.unet.graph.inputs.items():
            key = n.replace("_5F_", "_").lower()
            if "sample" in key and "latent" not in key:
                names["sample"] = n
            elif "timestep" in key or key == "t":
                names["timestep"] = n
            elif "hidden" in key or key == "cc":
                names["context"] = n
            elif "time_ids" in key:
                names["time_ids"] = n
            elif "text_embeds" in key or "add_embeds" in key:
                names["text_embeds"] = n
        return names

    def denoise(
        self,
        x: np.ndarray,
        sigma: float,
        cond,
        uncond,
        cfg_scale: float = 7.0,
    ) -> np.ndarray:
        """CompVis CFG denoiser (reference src/sd.cpp:1397-1558). cond/uncond
        are (77,d) arrays (SD1.5) or {'context','pooled'} dicts (SDXL, each
        branch carrying its own pooled embeds, sd.cpp:1500-1516)."""
        c_in, c_out = sched.get_scalings(sigma)
        t = sched.sigma_to_t(sigma)
        names = self._unet_input_names()

        def run(branch) -> np.ndarray:
            cc = branch["context"] if isinstance(branch, dict) else branch
            self.unet.clear_tensors()
            self.unet.add_tensor(names["sample"], (x * np.float32(c_in))[None])
            self.unet.add_tensor(names["timestep"], np.array([t], np.float32))
            self.unet.add_tensor(names["context"], cc[None].astype(np.float32))
            if "time_ids" in names:
                self.unet.add_tensor(names["time_ids"], SDXL_TIME_IDS)
            if "text_embeds" in names and isinstance(branch, dict):
                self.unet.add_tensor(names["text_embeds"], branch["pooled"])
            out = self.unet.run()
            eps = next(v for v in out.values() if v.ndim == 4)[0]
            return eps * np.float32(c_out) + x

        den_c = run(cond)
        if self.turbo or uncond is None:
            return den_c
        den_u = run(uncond)
        return den_u + np.float32(cfg_scale) * (den_c - den_u)

    def _unet_batch(self) -> int:
        names = self._unet_input_names()
        return next(
            spec.shape[0]
            for n, spec in self.unet.graph.inputs.items()
            if n == names["sample"]
        )

    @staticmethod
    def _stack_branches(cond, uncond):
        """Stack cond (row 0) and uncond (row 1) into one batch-2 branch."""
        if isinstance(cond, dict):
            return {
                "context": np.stack([
                    np.asarray(cond["context"], np.float32),
                    np.asarray(uncond["context"], np.float32),
                ]),
                "pooled": np.concatenate([
                    np.asarray(cond["pooled"], np.float32),
                    np.asarray(uncond["pooled"], np.float32),
                ], axis=0),
            }
        return np.stack([np.asarray(cond, np.float32), np.asarray(uncond, np.float32)])

    def _denoise_cfg2(self, x: np.ndarray, sigma: float, both, cfg_scale: float) -> np.ndarray:
        """CFG with ONE batch-2 UNet call: row 0 = cond, row 1 = uncond.

        The reference runs the two branches as two sequential model.run()s
        (src/sd.cpp:1519-1556); on the MXU a batch-2 pass costs well under 2x
        a batch-1 pass, so a pipeline built with a batch-2 UNet
        (from_synthetic(batch=2)) halves the per-step call count in the host
        loop. Bit-parity with denoise(): the rows never mix."""
        c_in, c_out = sched.get_scalings(sigma)
        t = sched.sigma_to_t(sigma)
        names = self._unet_input_names()
        xs = (x * np.float32(c_in)).astype(np.float32)
        self.unet.clear_tensors()
        self.unet.add_tensor(names["sample"], np.repeat(xs[None], 2, axis=0))
        self.unet.add_tensor(names["timestep"], np.array([t], np.float32))
        ctx = both["context"] if isinstance(both, dict) else both
        self.unet.add_tensor(names["context"], ctx)
        if "time_ids" in names:
            self.unet.add_tensor(names["time_ids"], np.tile(SDXL_TIME_IDS, (2, 1)))
        if "text_embeds" in names and isinstance(both, dict):
            self.unet.add_tensor(names["text_embeds"], both["pooled"])
        out = self.unet.run()
        eps = np.asarray(next(v for v in out.values() if np.asarray(v).ndim == 4), np.float32)
        den = eps * np.float32(c_out) + x[None]
        return den[1] + np.float32(cfg_scale) * (den[0] - den[1])

    # -------------------------------------------------------------- generate
    def generate(
        self,
        prompt: str,
        neg_prompt: str = "",
        steps: int = 10,
        seed: int = 42,
        sampler: str = "euler_a",
        cfg_scale: float = 7.0,
        decode: bool = True,
        tiled_decode: bool = False,
        preview_steps: bool = False,
        decode_steps: bool = False,
        init_latents: Optional[np.ndarray] = None,
    ) -> GenerationResult:
        if self.xl:
            cond = self.encode_prompt_xl(prompt)
            uncond = None if self.turbo else self.encode_prompt_xl(neg_prompt)
        else:
            cond = self.encode_prompt(prompt)
            uncond = None if self.turbo else self.encode_prompt(neg_prompt)

        sigma = sched.sigma_schedule(steps)
        x = init_latents if init_latents is not None else randn_4_w_h(seed % 1000, self.latw, self.lath) * sigma[0]
        x = np.asarray(x, np.float32)
        # a batch-2 UNet session runs both CFG branches in ONE call per step
        # (see _denoise_cfg2); otherwise two sequential batch-1 runs like the
        # reference (src/sd.cpp:1519-1556)
        cfg2 = uncond is not None and not self.turbo and self._unet_batch() == 2
        both = _device_branch(self._stack_branches(cond, uncond)) if cfg2 else None
        # the context/pooled embeds are loop-invariant: move them to the
        # device once so each denoise step only uploads the 64 KB latent
        # (host->device re-uploads are expensive on a tunneled chip,
        # docs/tpu_notes.md)
        cond = _device_branch(cond)
        uncond = _device_branch(uncond)
        state = S.SamplerState(sampler, steps, seed=seed, turbo=self.turbo)
        previews: List[np.ndarray] = []
        step_images: List[np.ndarray] = []

        def denoise_fn(xx, s):
            if cfg2:
                return self._denoise_cfg2(xx, float(s), both, cfg_scale)
            return self.denoise(xx, float(s), cond, uncond, cfg_scale)

        for i in range(steps):
            x = S.prescale_sample(x, sampler, steps, i, sigma, self.turbo)
            den = denoise_fn(x, float(sigma[i]))
            x = S.sampler_step(state, x, den, sigma, i, denoise_fn)
            if preview_steps:
                previews.append(latent_to_rgb(x, SDXL_LATENT_RGB_PROJ if self.xl else SD_LATENT_RGB_PROJ))
            if decode_steps and i < steps - 1 and self.vae_decoder is not None:
                # full decode of the in-progress latent; the last step's decode
                # is the normal output image (reference src/sd.cpp:1745-1746)
                step_images.append(self.decode(x, tiled=tiled_decode))

        image = self.decode(x, tiled=tiled_decode) if decode and self.vae_decoder is not None else None
        return GenerationResult(image=image, latents=x, previews=previews, step_images=step_images)

    # ---------------------------------------------------- on-device diffusion
    _device_gen_fns: Dict = None

    def generate_on_device(
        self,
        prompt: str,
        neg_prompt: str = "",
        steps: int = 10,
        seed: int = 42,
        sampler: str = "euler_a",
        cfg_scale: float = 7.0,
        decode: bool = True,
        tiled_decode: bool = False,
    ) -> GenerationResult:
        """The whole diffusion loop as ONE device program: a lax.scan over
        steps with the latents as carry — CFG, the euler/euler_a update and
        the (host-precomputed, bit-parity) ancestral noise all on device.
        Latents cross PCIe once, after the last step. Supports the euler
        family; other samplers use the host loop (generate())."""
        if sampler not in ("euler", "euler_a"):
            raise ValueError(f"generate_on_device supports euler/euler_a, not {sampler!r}")
        import jax
        import jax.numpy as jnp
        from jax import lax

        if self.xl:
            cond = self.encode_prompt_xl(prompt)
            uncond = None if self.turbo else self.encode_prompt_xl(neg_prompt)
        else:
            cond = self.encode_prompt(prompt)
            uncond = None if self.turbo else self.encode_prompt(neg_prompt)

        sigma = sched.sigma_schedule(steps)
        x0 = np.asarray(randn_4_w_h(seed % 1000, self.latw, self.lath) * sigma[0], np.float32)
        state = S.SamplerState(sampler, steps, seed=seed, turbo=self.turbo)

        # per-step scalars and the seeded noise stream, exactly as the host
        # sampler would consume them (models/sd/samplers.py euler/euler_a)
        c_ins, c_outs, ts, slopes, ups = [], [], [], [], []
        noises = []
        for i in range(steps):
            s_cur = float(sigma[i])
            c_in, c_out = sched.get_scalings(s_cur)
            c_ins.append(c_in)
            c_outs.append(c_out)
            ts.append(sched.sigma_to_t(s_cur))
            if sampler == "euler_a":
                up, down = S._ancestral_sigmas(s_cur, float(sigma[i + 1]))
                noises.append(state.noise(self.latw, self.lath))
                slopes.append((down - s_cur) / s_cur)
                ups.append(up)
            else:
                si1 = S._reshaper(float(sigma[i + 1]), i, steps, self.turbo)
                noises.append(np.zeros_like(x0))
                slopes.append((si1 - s_cur) / s_cur)
                ups.append(0.0)

        names = self._unet_input_names()
        key = ("gen", steps, self.turbo or uncond is None, float(cfg_scale))
        if self._device_gen_fns is None:
            self._device_gen_fns = {}
        cached = self._device_gen_fns.get(key)
        if cached is None:
            # plan/compile the unet for this input bucket, grab the pure fn
            self.unet.clear_tensors()
            self.unet.add_tensor(names["sample"], x0[None])
            self.unet.add_tensor(names["timestep"], np.array([ts[0]], np.float32))
            self.unet.add_tensor(names["context"],
                                 (cond["context"] if isinstance(cond, dict) else cond)[None].astype(np.float32))
            if "time_ids" in names:
                self.unet.add_tensor(names["time_ids"], SDXL_TIME_IDS)
            if "text_embeds" in names and isinstance(cond, dict):
                self.unet.add_tensor(names["text_embeds"], cond["pooled"])
            ex = self.unet._executor()
            assert len(ex.segments) == 1, "on-device generate requires a single segment"
            fn = ex._segment_fn(0)
            weights = ex._fetch_segment_weights(ex.segments[0], with_formats=False)
            out_name = next(
                n for n in ex.segments[0].out_names if ex.plan.avals[n].ndim == 4
            )
            cdt = self.unet.config.np_compute_dtype
            has_uncond = not (self.turbo or uncond is None)

            @jax.jit
            def run(weights_a, x0, per_step_stack, ctx_c, pool_c, ctx_u, pool_u):
                # weights flow through the jit boundary as arguments — a
                # closure would bake them into the executable as constants.
                # Conditioning is loop-invariant: it rides OUTSIDE the scan
                # stack so the host uploads each context once per call, not
                # once per step (the tunneled link makes duplicated uploads
                # measurable, docs/tpu_notes.md).

                def unet_eps(x_in, t, ctx, pooled):
                    acts = {
                        names["sample"]: x_in,
                        names["timestep"]: t.reshape(1),
                        names["context"]: ctx,
                    }
                    if "time_ids" in names:
                        acts[names["time_ids"]] = jnp.asarray(SDXL_TIME_IDS)
                    if "text_embeds" in names and pooled is not None:
                        acts[names["text_embeds"]] = pooled
                    return fn(weights_a, acts)[out_name]

                def step(x, per_step):
                    t, c_in, c_out, slope, up, noise = per_step
                    x_in = (x * c_in).astype(cdt)[None]
                    if has_uncond:
                        # one vmapped UNet over the CFG pair: batches the MXU
                        # work and reads the 1.7 GB of weights once per step
                        # instead of once per branch (x_in is closed over, so
                        # only the conditioning is batched)
                        ctxs = jnp.stack([ctx_c, ctx_u])
                        pools = jnp.stack([pool_c, pool_u])
                        eps2 = jax.vmap(lambda c, p: unet_eps(x_in, t, c, p))(ctxs, pools)
                        eps_c = eps2[0][0].astype(jnp.float32)
                        eps_u = eps2[1][0].astype(jnp.float32)
                        den_u = eps_u * c_out + x
                        den = den_u + cfg_scale * ((eps_c * c_out + x) - den_u)
                    else:
                        eps_c = unet_eps(x_in, t, ctx_c, pool_c)[0].astype(jnp.float32)
                        den = eps_c * c_out + x
                    x = x + (x - den) * slope + noise * up
                    return x, None

                x, _ = lax.scan(step, x0, per_step_stack)
                return x

            cached = (run, weights)
            self._device_gen_fns[key] = cached
        run_fn, weights_in = cached

        def ctx_of(c):
            return np.asarray(c["context"] if isinstance(c, dict) else c, np.float32)[None]

        def pool_of(c):
            if isinstance(c, dict):
                return np.asarray(c["pooled"], np.float32)
            return np.zeros((1, 1), np.float32)  # unused placeholder

        per_step = (
            np.asarray(ts, np.float32),
            np.asarray(c_ins, np.float32),
            np.asarray(c_outs, np.float32),
            np.asarray(slopes, np.float32),
            np.asarray(ups, np.float32),
            np.stack(noises).astype(np.float32),
        )
        x = np.asarray(
            run_fn(
                weights_in,
                x0,
                per_step,
                ctx_of(cond),
                pool_of(cond),
                ctx_of(uncond if uncond is not None else cond),
                pool_of(uncond if uncond is not None else cond),
            ),
            np.float32,
        )

        image = self.decode(x, tiled=tiled_decode) if decode and self.vae_decoder is not None else None
        return GenerationResult(image=image, latents=x, previews=[])

    # -------------------------------------------------------- batched generate
    def _denoise_batch(self, xb: np.ndarray, sigma: float, conds, unconds, cfg_scale: float) -> np.ndarray:
        """CFG denoise over a real batch (N,4,h,w) — the TPU-native form of
        the reference's N-coroutine batch replay (src/sd.cpp:1031-1161,
        onnxstream.cpp:3817-3847): one MXU pass over all images instead of N
        sequential op replays."""
        c_in, c_out = sched.get_scalings(sigma)
        t = sched.sigma_to_t(sigma)
        names = self._unet_input_names()
        N = xb.shape[0]

        def run(branches) -> np.ndarray:
            ctx = np.stack([b["context"] if isinstance(b, dict) else b for b in branches])
            self.unet.clear_tensors()
            self.unet.add_tensor(names["sample"], (xb * np.float32(c_in)).astype(np.float32))
            self.unet.add_tensor(names["timestep"], np.array([t], np.float32))
            self.unet.add_tensor(names["context"], ctx.astype(np.float32))
            if "time_ids" in names:
                self.unet.add_tensor(names["time_ids"], np.tile(SDXL_TIME_IDS, (N, 1)))
            if "text_embeds" in names and isinstance(branches[0], dict):
                self.unet.add_tensor(names["text_embeds"],
                                     np.concatenate([b["pooled"] for b in branches], axis=0))
            out = self.unet.run()
            eps = next(v for v in out.values() if v.ndim == 4)
            return np.asarray(eps, np.float32) * np.float32(c_out) + xb

        den_c = run(conds)
        if self.turbo or unconds is None:
            return den_c
        den_u = run(unconds)
        return den_u + np.float32(cfg_scale) * (den_c - den_u)

    def generate_batch(
        self,
        prompts: List[str],
        neg_prompts: Optional[List[str]] = None,
        steps: int = 10,
        seeds: Optional[List[int]] = None,
        sampler: str = "euler_a",
        cfg_scale: float = 7.0,
        decode: bool = True,
        tiled_decode: bool = False,
    ) -> List[GenerationResult]:
        """Generate len(prompts) images with one batched UNet. The sampler
        math stays per-image (own seed, own history), so image i is
        bit-identical to a sequential generate() with the same seed."""
        N = len(prompts)
        batch_in = next(
            spec.shape[0] for n, spec in self.unet.graph.inputs.items()
            if n == self._unet_input_names()["sample"]
        )
        if batch_in != N:
            raise ValueError(
                f"unet session has batch {batch_in}; build the pipeline with batch={N} "
                f"(from_synthetic(batch=N)) or generate sequentially"
            )
        seeds = seeds if seeds is not None else list(range(42, 42 + N))
        neg_prompts = neg_prompts if neg_prompts is not None else [""] * N

        enc = self.encode_prompt_xl if self.xl else self.encode_prompt
        conds = [enc(p) for p in prompts]
        unconds = None if self.turbo else [enc(p) for p in neg_prompts]

        sigma = sched.sigma_schedule(steps)
        xs = [
            np.asarray(randn_4_w_h(seeds[i] % 1000, self.latw, self.lath) * sigma[0], np.float32)
            for i in range(N)
        ]
        states = [S.SamplerState(sampler, steps, seed=seeds[i], turbo=self.turbo) for i in range(N)]

        import threading

        for i in range(steps):
            xb = np.stack([S.prescale_sample(x, sampler, steps, i, sigma, self.turbo) for x in xs])
            den = self._denoise_batch(xb, float(sigma[i]), conds, unconds, cfg_scale)

            if N == 1:
                def fn_single(x2, s):
                    return self._denoise_batch(
                        x2[None], float(s), conds, unconds, cfg_scale)[0]

                xs = [S.sampler_step(states[0], xb[0], den[0], sigma, i, fn_single)]
                continue

            # Multi-stage samplers re-call the denoiser per image. The N
            # images run the SAME sampler at the same (i, steps), and
            # sampler control flow never depends on tensor values — so the
            # per-image calls happen in lockstep and a barrier can stack
            # them into ONE batched UNet pass per call site. This is the
            # thread-based form of the reference's N-coroutine batch replay
            # (src/sd.cpp:1031-1161); the old shape — tiling one image
            # across the batch per call — cost N full batched passes per
            # stage (N^2 per-image denoises).
            slot: List[Optional[np.ndarray]] = [None] * N
            shared = {"res": None, "s": None}
            barrier = threading.Barrier(N)

            def mk_denoise_fn(j):
                def fn(x2, s):
                    slot[j] = x2
                    shared["s"] = float(s)
                    if barrier.wait() == 0:
                        shared["res"] = self._denoise_batch(
                            np.stack(slot), shared["s"], conds, unconds, cfg_scale)
                    barrier.wait()
                    return shared["res"][j]
                return fn

            outs: List[Optional[np.ndarray]] = [None] * N
            errs: List[Optional[BaseException]] = [None] * N

            def run_j(j):
                try:
                    outs[j] = S.sampler_step(
                        states[j], xb[j], den[j], sigma, i, mk_denoise_fn(j))
                except BaseException as e:  # noqa: BLE001 - relayed below
                    errs[j] = e
                    barrier.abort()

            threads = [threading.Thread(target=run_j, args=(j,)) for j in range(N)]
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            first_err = next((e for e in errs
                              if e is not None
                              and not isinstance(e, threading.BrokenBarrierError)), None)
            if first_err is not None:
                raise first_err
            xs = list(outs)

        results = []
        for j in range(N):
            img = self.decode(xs[j], tiled=tiled_decode) if decode and self.vae_decoder is not None else None
            results.append(GenerationResult(image=img, latents=xs[j], previews=[]))
        return results

    # ----------------------------------------------------------------- decode
    def decode(self, latents: np.ndarray, tiled: bool = False) -> np.ndarray:
        """(4,h,w) latents -> (8h,8w,3) uint8 image."""
        if tiled:
            return self._decode_tiled(latents)
        z = (latents / np.float32(self.vae_scale))[None]
        self.vae_decoder.clear_tensors()
        name = next(iter(self.vae_decoder.graph.inputs))
        self.vae_decoder.add_tensor(name, z.astype(np.float32))
        out = self.vae_decoder.run()
        img = next(v for v in out.values() if v.ndim == 4)[0]  # (3, H, W)
        img = (img.transpose(1, 2, 0) + 1.0) * 127.5
        return np.clip(img, 0, 255).astype(np.uint8)

    _tile_size = 32
    _tile_decode_fns: Dict = None

    @staticmethod
    def _tile_grid(lh: int, lw: int, tile: int, stride: int) -> Tuple[List[int], List[int]]:
        # max(0, ...): a latent smaller than the tile gets ONE tile at origin
        # 0 (the decode slices clamp to the latent), not a negative origin
        # that would mis-place the assignment
        ys: List[int] = []
        y = 0
        while True:
            ys.append(max(0, min(y, lh - tile)))
            if y >= lh - tile:
                break
            y += stride
        xs: List[int] = []
        xx = 0
        while True:
            xs.append(max(0, min(xx, lw - tile)))
            if xx >= lw - tile:
                break
            xx += stride
        return ys, xs

    @staticmethod
    def _blend_factor(dy: int, dx: int, th: int, tw: int, ramp: int) -> np.ndarray:
        """Linear 25%-overlap blend ramp (reference blend, src/sd.cpp:1300-1326)."""
        fy = np.ones((th, 1), np.float32)
        if dy:
            fy[: min(ramp, th), 0] = np.arange(min(ramp, th), dtype=np.float32) / ramp
        fx = np.ones((1, tw), np.float32)
        if dx:
            fx[0, : min(ramp, tw)] = np.arange(min(ramp, tw), dtype=np.float32) / ramp
        return fy * fx

    def _decode_tiled(self, latents: np.ndarray, tile: Optional[int] = None, stride: Optional[int] = None, ramp: Optional[int] = None) -> np.ndarray:
        """Tiled decode with linear overlap blending (reference
        sd_tiled_decoder src/sd.cpp:1258-1346 / sdxl_decoder 2357-2517).

        TPU-native: the whole tile grid is ONE compiled device program — the
        tiles are static slices of the latent, the decoder runs vmapped over
        the tile batch (one MXU pass instead of a host loop of per-tile
        session runs), the overlap blend happens on device, and a single
        uint8 image crosses PCIe. Falls back to the per-tile host loop when
        the decoder is segmented (hbm_budget streaming)."""
        tile = tile or self._tile_size
        z_lh, z_lw = latents.shape[1], latents.shape[2]
        # a latent smaller than the tile decodes as ONE clamped tile — the
        # old grid emitted a negative origin and mis-placed the assignment
        tile = min(tile, z_lh, z_lw)
        sess = self.vae_tile_session or self.vae_decoder
        # upscale factor from the tile model's declared output shape
        out_spec = sess.graph.produced[sess.graph.output_names()[0]]
        in_spec = next(iter(sess.graph.inputs.values()))
        scale = out_spec.shape[-1] // in_spec.shape[-1] if out_spec.shape and in_spec.shape[-1] else 8
        stride = stride if stride is not None else max(tile * 3 // 4, 1)  # 25% overlap (sd.cpp:1330)
        stride = min(stride, tile)
        ramp = ramp if ramp is not None else (tile - stride) * scale  # blend over the overlap
        z = latents / np.float32(self.vae_scale)
        lh, lw = z.shape[1], z.shape[2]
        ys, xs = self._tile_grid(lh, lw, tile, stride)
        name = next(iter(sess.graph.inputs))

        # establish the per-tile shape bucket, then grab the compiled segment
        sess.clear_tensors()
        sess.add_tensor(name, z[None, :, :tile, :tile].astype(np.float32))
        ex = sess._executor()
        if len(ex.segments) != 1:
            return self._decode_tiled_host(z, sess, name, tile, scale, stride, ramp, ys, xs)

        import jax
        import jax.numpy as jnp

        if self._tile_decode_fns is None:
            self._tile_decode_fns = {}
        key = (id(sess), tile, stride, ramp, lh, lw)
        cached = self._tile_decode_fns.get(key)
        if cached is None:
            fn = ex._segment_fn(0)
            out_name = next(n for n in ex.segments[0].out_names if ex.plan.avals[n].ndim == 4)
            th = tw = tile * scale
            factors = np.stack(
                [self._blend_factor(sy * scale, sx * scale, th, tw, ramp) for sy in ys for sx in xs]
            )  # (T, th, tw)

            @jax.jit
            def run(weights_a, z_a):
                tiles = jnp.stack(
                    [z_a[:, sy : sy + tile, sx : sx + tile] for sy in ys for sx in xs]
                )  # (T, 4, tile, tile)
                imgs = jax.vmap(lambda zt: fn(weights_a, {name: zt[None]})[out_name][0])(tiles)
                imgs = imgs.astype(jnp.float32)  # (T, 3, th, tw)
                res = jnp.zeros((3, lh * scale, lw * scale), jnp.float32)
                t = 0
                for sy in ys:
                    for sx in xs:
                        dy, dx = sy * scale, sx * scale
                        f = factors[t]
                        region = jax.lax.dynamic_slice(res, (0, dy, dx), (3, th, tw))
                        blended = imgs[t] * f + region * (1.0 - f)
                        res = jax.lax.dynamic_update_slice(res, blended, (0, dy, dx))
                        t += 1
                img8 = jnp.clip((res.transpose(1, 2, 0) + 1.0) * 127.5, 0, 255)
                # f32->u8 convert truncates toward zero in XLA, same as the
                # host path's np.astype
                return img8.astype(jnp.uint8)

            weights = ex._fetch_segment_weights(ex.segments[0], with_formats=False)
            cached = (run, weights)
            self._tile_decode_fns[key] = cached
        run_fn, weights_in = cached
        return np.asarray(run_fn(weights_in, jnp.asarray(z, jnp.float32)))

    def _decode_tiled_host(self, z, sess, name, tile, scale, stride, ramp, ys, xs) -> np.ndarray:
        """Per-tile host loop (streaming-decoder fallback) — same math."""
        lh, lw = z.shape[1], z.shape[2]
        res = np.zeros((3, lh * scale, lw * scale), np.float32)
        for sy in ys:
            for sx in xs:
                sess.clear_tensors()
                sess.add_tensor(name, z[None, :, sy : sy + tile, sx : sx + tile].astype(np.float32))
                out = sess.run()
                img = next(v for v in out.values() if v.ndim == 4)[0]  # (3, tile*scale, tile*scale)
                dy, dx = sy * scale, sx * scale
                th, tw = img.shape[1], img.shape[2]
                f = self._blend_factor(dy, dx, th, tw, ramp)
                region = res[:, dy : dy + th, dx : dx + tw]
                res[:, dy : dy + th, dx : dx + tw] = img * f + region * (1 - f)

        img = (res.transpose(1, 2, 0) + 1.0) * 127.5
        return np.clip(img, 0, 255).astype(np.uint8)

    # ------------------------------------------------------------- latents IO
    @staticmethod
    def save_latents(path: str, latents: np.ndarray) -> None:
        np.asarray(latents, np.float32).tofile(path)

    @staticmethod
    def load_latents(path: str, lath: int, latw: int) -> np.ndarray:
        return np.fromfile(path, np.float32).reshape(4, lath, latw)


def save_image(img: np.ndarray, path: str, parameters: Optional[str] = None) -> None:
    """PNG/JPEG writer with optional embedded generation parameters
    (reference --embed-parameters, src/sd.cpp:447-509)."""
    from PIL import Image
    from PIL.PngImagePlugin import PngInfo

    im = Image.fromarray(img)
    if path.lower().endswith(".png") and parameters:
        info = PngInfo()
        info.add_text("parameters", parameters)
        im.save(path, pnginfo=info)
    elif parameters:
        im.save(path, comment=parameters.encode())
    else:
        im.save(path)
