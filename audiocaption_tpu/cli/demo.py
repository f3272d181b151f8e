"""Interactive captioning demo (reference demo.py:27-85).

With gradio installed this serves the same UI as the reference (audio
upload -> beam-3 caption); otherwise it falls back to a terminal REPL
over file paths.  Input normalization matches demo.py:27-45: int16/int32
-> [-1, 1], stereo mixdown, resample to the model rate.

    python -m audiocaption_tpu.cli.demo --checkpoint EXP/seed_1/swa.pth
"""

from __future__ import annotations

import argparse

import numpy as np


def normalize_audio(sr: int, data: np.ndarray, target_sr: int
                    ) -> np.ndarray:
    from audiocaption_tpu.data.dataset import resample
    if data.dtype == np.int16:
        data = data / 32768.0
    elif data.dtype == np.int32:
        data = data / 2147483648.0
    data = np.asarray(data, np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1)
    return resample(data, sr, target_sr)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--beam_size", type=int, default=3)
    parser.add_argument("--share", action="store_true")
    args = parser.parse_args(argv)

    from pathlib import Path
    import jax.numpy as jnp
    from audiocaption_tpu.cli.run import Runner
    from audiocaption_tpu.models.captioner import generate

    ckpt = Path(args.checkpoint)
    cfg, model, variables, tokenizer = Runner()._load_experiment(
        str(ckpt.parent), ckpt.name)
    target_sr = model.mel.sample_rate

    def caption(sr: int, data: np.ndarray) -> str:
        wav = normalize_audio(sr, data, target_sr)
        out = generate(model, variables, jnp.asarray(wav[None]),
                       jnp.asarray([len(wav)]), sample_method="beam",
                       beam_size=args.beam_size)
        return tokenizer.decode(np.asarray(out["seq"]))[0]

    try:
        import gradio as gr

        def infer(audio):
            sr, data = audio
            return caption(sr, data)

        gr.Interface(fn=infer, inputs=gr.Audio(label="audio"),
                     outputs=gr.Text(label="caption"),
                     title="audiocaption_tpu demo").launch(
            share=args.share)
    except ImportError:
        from audiocaption_tpu.cli.inference import read_wav
        print("gradio not installed; file-path REPL (ctrl-d to exit)")
        while True:
            try:
                path = input("wav path> ").strip()
            except EOFError:
                break
            if not path:
                continue
            try:
                sr, data = read_wav(path)
                print(caption(sr, data))
            except Exception as e:
                print(f"error: {e}")


if __name__ == "__main__":
    main()
