"""Gradio demo (reference app.py:16-98), import-gated: gradio is optional.

Unlike the reference — which reloads the entire pipeline per request
(app.py:24-37) — the pipeline is built once and the compiled generate graph
is reused across requests.
"""
from __future__ import annotations

def build_interface(pipe):
    import gradio as gr

    def run(image, prompt, negative_prompt, steps, merge_step, guidance,
            seed):
        img = pipe.generate(
            prompt, image, negative_prompt=negative_prompt,
            num_inference_steps=int(steps),
            start_merge_step=int(merge_step),
            guidance_scale=float(guidance), seed=int(seed))
        return img[0]

    return gr.Interface(
        fn=run,
        inputs=[
            gr.Image(type="pil", label="reference face"),
            gr.Textbox(label="prompt"),
            gr.Textbox(label="negative prompt", value=""),
            gr.Slider(1, 100, value=50, label="steps"),
            gr.Slider(0, 100, value=30, label="start merge step"),
            gr.Slider(1.0, 15.0, value=5.0, label="guidance scale"),
            gr.Number(value=2024, label="seed"),
        ],
        outputs=gr.Image(label="result"),
        title="ConsistentID-TPU",
    )


def main(argv=None):
    from .infer import build_parser
    p = build_parser()
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args(argv)

    try:
        import gradio  # noqa: F401
    except ImportError as e:
        raise SystemExit("gradio is not installed in this environment; "
                         "use consistentid_tpu.apps.infer instead") from e

    from ..core.config import PipelineConfig
    from ..pipelines.loading import load_sd15_consistentid

    pipe = load_sd15_consistentid(
        args.base, consistentid_path=args.consistentid,
        image_encoder_path=args.image_encoder, bisenet_path=args.bisenet,
        arcface_path=args.arcface,
        pipeline_config=PipelineConfig())
    build_interface(pipe).launch(server_port=args.port)


if __name__ == "__main__":
    main()
