"""Interactive decomposition app — reference eval/test_app.py (SURVEY C13):
upload -> box/point select -> segment -> ensemble decompose -> show maps.

The reference app is broken as committed (imports nonexistent classes,
test_app.py:54-55); this one runs.  gradio is optional (not in the base
image): `python -m unirenderer_tpu.eval.app` starts the UI when gradio is
installed, else prints instructions.

Segmentation (reference: in-process SAM2 from a 2-click box,
test_app.py:169-192) is pluggable per eval/segmentation.py: upload an
external mask (SAM2 command documented there), give a box for the
built-in box-prompt heuristic, or fall back to the white-background
heuristic.
"""

from __future__ import annotations

import numpy as np


def build_app(pipe=None, steps: int = 20, ensemble: int = 5):
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError(
            "gradio is not installed in this image; run "
            "unirenderer_tpu.eval.run_inverse for the CLI path") from e

    import jax
    import jax.numpy as jnp

    from unirenderer_tpu.core import config
    from unirenderer_tpu.eval.segmentation import auto_mask, box_prompt_mask
    from unirenderer_tpu.pipelines import UniRendererPipeline

    if pipe is None:
        pipe = UniRendererPipeline.create(config.flagship(),
                                          jax.random.key(0))

    def decompose(image, mask_img, box_text):
        img01 = np.asarray(image, np.float32) / 255.0
        mask01 = make_mask(img01, mask_img, box_text)
        out = pipe.real_image2mask_3mod_albedo(
            image=jnp.asarray(img01 * 2 - 1)[None],
            mask=jnp.asarray(mask01 * 2 - 1)[None],
            rng=jax.random.key(0), num_steps=steps, ensemble=ensemble)
        to_img = lambda x: ((np.asarray(x)[0] + 1) / 2 * 255).astype(
            np.uint8)
        grey = lambda x: (np.repeat(np.asarray(x)[0][..., None], 3, -1)
                          * 255).astype(np.uint8)
        return (to_img(out["albedo"]), to_img(out["normal"]),
                grey(out["metallic"]), grey(out["roughness"]),
                to_img(out["spec_light"]), to_img(out["diff_light"]))

    def make_mask(img01, mask_img, box_text):
        if mask_img is not None:           # external mask (SAM2 etc.)
            m = np.asarray(mask_img, np.float32)
            if m.ndim == 3:
                m = m[..., 0]
            return ((m > 127).astype(np.float32)[..., None].repeat(3, -1))
        if box_text:
            return box_prompt_mask(
                img01, [int(v) for v in box_text.split(",")])
        return auto_mask(img01)

    def relight(image, mask_img, box_text, env_img):
        """Decompose + re-render under the uploaded environment (treated
        as an LDR latlong, sRGB->linear) — pipelines.relight."""
        if env_img is None:
            raise ValueError("upload an environment image to relight")
        img01 = np.asarray(image, np.float32) / 255.0
        mask01 = make_mask(img01, mask_img, box_text)
        env01 = (np.asarray(env_img, np.float32) / 255.0) ** 2.2
        relit = pipe.relight(
            image=jnp.asarray(img01 * 2 - 1)[None],
            mask=jnp.asarray(mask01 * 2 - 1)[None],
            new_env=jnp.asarray(env01), rng=jax.random.key(0),
            num_steps=steps, ensemble=1)
        return ((np.asarray(relit)[0] + 1) / 2 * 255).astype(np.uint8)

    with gr.Blocks(title="uni-renderer-tpu") as demo:
        gr.Markdown("# Uni-Renderer TPU — inverse rendering")
        with gr.Row():
            inp = gr.Image(label="input")
            mask_in = gr.Image(label="mask (optional; see "
                               "eval/segmentation.py for the SAM2 recipe)")
        box_in = gr.Textbox(label="box prompt x0,y0,x1,y1 (optional)")
        btn = gr.Button("Decompose")
        outs = [gr.Image(label=n) for n in
                ("albedo", "normal", "metallic", "roughness",
                 "spec_light", "diff_light")]
        btn.click(decompose, inputs=[inp, mask_in, box_in], outputs=outs)
        gr.Markdown("## Relight")
        env_in = gr.Image(label="new environment (latlong)")
        rbtn = gr.Button("Relight")
        relit_out = gr.Image(label="relit")
        rbtn.click(relight, inputs=[inp, mask_in, box_in, env_in],
                   outputs=[relit_out])
    return demo


def main():
    demo = build_app()
    demo.launch()


if __name__ == "__main__":
    main()
