"""Interactive decomposition app — reference eval/test_app.py (SURVEY C13):
upload -> box/point select -> segment -> ensemble decompose -> show maps.

The reference app is broken as committed (imports nonexistent classes,
test_app.py:54-55); this one runs.  Two frontends share one numpy-level
`AppBackend`:

  * `python -m unirenderer_tpu.eval.http_app` — dependency-free stdlib
    HTTP UI (works in this image; upload, box prompt, decompose, relight).
  * `build_app()` — the gradio UI, when gradio is installed.

Segmentation (reference: in-process SAM2 from a 2-click box,
test_app.py:169-192) is pluggable per eval/segmentation.py: upload an
external mask (SAM2 command documented there), give a box for the
built-in box-prompt heuristic, or fall back to the white-background
heuristic.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

MAP_NAMES = ("albedo", "normal", "metallic", "roughness",
             "spec_light", "diff_light")


class AppBackend:
    """Framework-independent app logic: uint8 images in, uint8 maps out.

    Wraps a UniRendererPipeline (any config / any trained params); both the
    gradio UI and the stdlib HTTP UI call exactly these two methods, so the
    served behavior is identical regardless of frontend.
    """

    def __init__(self, pipe=None, steps: int = 20, ensemble: int = 5):
        import jax

        if pipe is None:
            from unirenderer_tpu.core import config
            from unirenderer_tpu.pipelines import UniRendererPipeline
            pipe = UniRendererPipeline.create(config.flagship(),
                                              jax.random.key(0))
        self.pipe = pipe
        self.steps = steps
        self.ensemble = ensemble
        self.size = pipe.cfg.vae.sample_size

    # -- helpers -----------------------------------------------------------

    def _resize(self, img_u8: np.ndarray) -> np.ndarray:
        from PIL import Image
        img = Image.fromarray(np.asarray(img_u8, np.uint8)).convert("RGB")
        img = img.resize((self.size, self.size), Image.BILINEAR)
        return np.asarray(img, np.float32) / 255.0

    def make_mask(self, img01: np.ndarray,
                  mask_u8: Optional[np.ndarray],
                  box_text: Optional[str],
                  point_text: Optional[str] = None,
                  orig_hw: Optional[tuple] = None) -> np.ndarray:
        """Prompt coords (box/point) are in the UPLOADED image's pixel
        space when `orig_hw` is given; they are scaled to the working
        resolution here."""
        from unirenderer_tpu.eval.segmentation import (
            auto_mask, box_prompt_mask, point_prompt_mask,
        )
        if mask_u8 is not None:            # external mask (SAM2 etc.)
            m = self._resize(mask_u8)[..., 0]
            return (m > 0.5).astype(np.float32)[..., None].repeat(3, -1)

        def scale(vals, stride=2):
            vals = [int(v) for v in vals]
            if orig_hw is None:
                return vals
            oh, ow = orig_hw
            sx, sy = self.size / ow, self.size / oh
            out = []
            for i, v in enumerate(vals):
                s = sx if i % 2 == 0 else sy
                # preserve the sign convention (negative = bg click)
                out.append(int(round(abs(v) * s)) * (1 if v >= 0 else -1))
            return out

        if box_text:
            return box_prompt_mask(img01, scale(box_text.split(",")))
        if point_text:                     # SAM2-style click prompts
            return point_prompt_mask(img01, scale(point_text.split(",")))
        return auto_mask(img01)

    # -- the two app actions ----------------------------------------------

    def decompose(self, image_u8: np.ndarray,
                  mask_u8: Optional[np.ndarray] = None,
                  box_text: Optional[str] = None,
                  point_text: Optional[str] = None
                  ) -> Dict[str, np.ndarray]:
        """image (+ optional mask / box / click prompt) -> 6 uint8 maps."""
        import jax
        import jax.numpy as jnp

        img01 = self._resize(image_u8)
        mask01 = self.make_mask(img01, mask_u8, box_text, point_text,
                                orig_hw=np.asarray(image_u8).shape[:2])
        out = self.pipe.real_image2mask_3mod_albedo(
            image=jnp.asarray(img01 * 2 - 1)[None],
            mask=jnp.asarray(mask01 * 2 - 1)[None],
            rng=jax.random.key(0), num_steps=self.steps,
            ensemble=self.ensemble)
        to_img = lambda x: np.asarray(    # noqa: E731
            np.clip((np.asarray(x)[0] + 1) / 2, 0, 1) * 255, np.uint8)
        grey = lambda x: np.asarray(      # noqa: E731
            np.clip(np.repeat(np.asarray(x)[0][..., None], 3, -1), 0, 1)
            * 255, np.uint8)
        return {"albedo": to_img(out["albedo"]),
                "normal": to_img(out["normal"]),
                "metallic": grey(out["metallic"]),
                "roughness": grey(out["roughness"]),
                "spec_light": to_img(out["spec_light"]),
                "diff_light": to_img(out["diff_light"])}

    def relight(self, image_u8: np.ndarray,
                mask_u8: Optional[np.ndarray],
                box_text: Optional[str],
                env_u8: np.ndarray,
                point_text: Optional[str] = None) -> np.ndarray:
        """Decompose + re-render under the uploaded environment (treated
        as an LDR latlong, sRGB->linear) — pipelines.relight."""
        import jax
        import jax.numpy as jnp

        if env_u8 is None:
            raise ValueError("upload an environment image to relight")
        img01 = self._resize(image_u8)
        mask01 = self.make_mask(img01, mask_u8, box_text, point_text,
                                orig_hw=np.asarray(image_u8).shape[:2])
        env01 = (np.asarray(env_u8, np.float32) / 255.0) ** 2.2
        if env01.ndim == 3 and env01.shape[-1] == 4:
            env01 = env01[..., :3]
        relit = self.pipe.relight(
            image=jnp.asarray(img01 * 2 - 1)[None],
            mask=jnp.asarray(mask01 * 2 - 1)[None],
            new_env=jnp.asarray(env01), rng=jax.random.key(0),
            num_steps=self.steps, ensemble=1)
        return np.asarray(
            np.clip((np.asarray(relit)[0] + 1) / 2, 0, 1) * 255, np.uint8)


def build_app(pipe=None, steps: int = 20, ensemble: int = 5):
    """The gradio frontend over AppBackend (when gradio is installed)."""
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError(
            "gradio is not installed in this image; use "
            "`python -m unirenderer_tpu.eval.http_app` (stdlib UI) or "
            "unirenderer_tpu.eval.run_inverse for the CLI path") from e

    backend = AppBackend(pipe, steps=steps, ensemble=ensemble)

    def decompose(image, mask_img, box_text, point_text):
        out = backend.decompose(image, mask_img, box_text, point_text)
        return tuple(out[n] for n in MAP_NAMES)

    def relight(image, mask_img, box_text, point_text, env_img):
        return backend.relight(image, mask_img, box_text, env_img,
                               point_text=point_text)

    with gr.Blocks(title="uni-renderer-tpu") as demo:
        gr.Markdown("# Uni-Renderer TPU — inverse rendering")
        with gr.Row():
            inp = gr.Image(label="input")
            mask_in = gr.Image(label="mask (optional; see "
                               "eval/segmentation.py for the SAM2 recipe)")
        box_in = gr.Textbox(label="box prompt x0,y0,x1,y1 (optional)")
        pt_in = gr.Textbox(label="point prompt x,y[,x,y...] (optional; "
                           "negative pair = background click)")
        btn = gr.Button("Decompose")
        outs = [gr.Image(label=n) for n in MAP_NAMES]
        btn.click(decompose, inputs=[inp, mask_in, box_in, pt_in],
                  outputs=outs)
        gr.Markdown("## Relight")
        env_in = gr.Image(label="new environment (latlong)")
        rbtn = gr.Button("Relight")
        relit_out = gr.Image(label="relit")
        rbtn.click(relight, inputs=[inp, mask_in, box_in, pt_in, env_in],
                   outputs=[relit_out])
    return demo


def main():
    demo = build_app()
    demo.launch()


if __name__ == "__main__":
    main()
