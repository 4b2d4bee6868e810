"""`neuralchat` command-line interface.

Reference: neural_chat/cli/cli_commands.py:34-211 — command registry with
`predict` (TextVoiceChatExecutor) and `finetune` (FinetuingExecutor), plus
server start commands (server/server_commands.py). Voice I/O plugins are
not in this build, so `predict` is text-only.
"""

from __future__ import annotations

import argparse
import sys


def _cmd_predict(args) -> int:
    from intel_extension_for_transformers_tpu.neural_chat.chatbot import (
        build_chatbot,
    )
    from intel_extension_for_transformers_tpu.neural_chat.config import (
        GenerationConfig,
        PipelineConfig,
    )
    from intel_extension_for_transformers_tpu.utils.error_utils import (
        get_latest_error,
    )

    chatbot = build_chatbot(
        PipelineConfig(
            model_name_or_path=args.model_name_or_path,
            generation_config=GenerationConfig(
                max_new_tokens=args.max_new_tokens,
                temperature=args.temperature,
                do_sample=args.temperature > 0,
            ),
        )
    )
    if chatbot is None:
        print(f"failed to build chatbot: {get_latest_error()}", file=sys.stderr)
        return 1
    if args.query:
        for delta in chatbot.predict_stream(args.query):
            print(delta, end="", flush=True)
        print()
        return 0
    # interactive REPL
    print("neuralchat — interactive mode, Ctrl-D to exit")
    try:
        while True:
            query = input("> ").strip()
            if not query:
                continue
            for delta in chatbot.predict_stream(query):
                print(delta, end="", flush=True)
            print()
    except (EOFError, KeyboardInterrupt):
        print()
    return 0


def _cmd_serve(args) -> int:
    import logging

    from intel_extension_for_transformers_tpu.neural_chat.server import (
        NeuralChatServerExecutor,
    )

    logging.basicConfig(level=logging.INFO)
    executor = NeuralChatServerExecutor()
    if args.config_file:
        ok = executor.init(args.config_file)
    else:
        ok = executor.init(
            {
                "host": args.host,
                "port": args.port,
                "model_name_or_path": args.model_name_or_path,
            }
        )
    if not ok:
        print("server init failed", file=sys.stderr)
        return 1
    executor.run()
    return 0


def _cmd_finetune(args) -> int:
    from intel_extension_for_transformers_tpu.neural_chat.chatbot import (
        finetune_model,
    )
    from intel_extension_for_transformers_tpu.neural_chat.config import (
        FinetuningConfig,
    )

    finetune_model(
        FinetuningConfig(
            model_name_or_path=args.model_name_or_path,
            train_file=args.train_file,
            lora_rank=args.lora_rank,
            qlora=args.qlora,
            num_train_epochs=args.epochs,
            max_steps=args.max_steps,
            output_dir=args.output_dir,
        )
    )
    return 0


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="neuralchat", description="TPU-native NeuralChat CLI"
    )
    sub = p.add_subparsers(dest="command", required=True)

    pr = sub.add_parser("predict", help="chat with a model (one-shot or REPL)")
    pr.add_argument("--model_name_or_path", default="meta-llama/Llama-2-7b-chat-hf")
    pr.add_argument("--query", default=None)
    pr.add_argument("--max_new_tokens", type=int, default=256)
    pr.add_argument("--temperature", type=float, default=0.9)
    pr.set_defaults(fn=_cmd_predict)

    sv = sub.add_parser("serve", help="start the OpenAI-compatible server")
    sv.add_argument("--config_file", default=None)
    sv.add_argument("--host", default="0.0.0.0")
    sv.add_argument("--port", type=int, default=8000)
    sv.add_argument("--model_name_or_path", default="meta-llama/Llama-2-7b-chat-hf")
    sv.set_defaults(fn=_cmd_serve)

    ft = sub.add_parser("finetune", help="LoRA/QLoRA finetune a model")
    ft.add_argument("--model_name_or_path", required=True)
    ft.add_argument("--train_file", default=None)
    ft.add_argument("--lora_rank", type=int, default=8)
    ft.add_argument("--qlora", action="store_true")
    ft.add_argument("--epochs", type=int, default=1)
    ft.add_argument("--max_steps", type=int, default=-1)
    ft.add_argument("--output_dir", default="./finetuned")
    ft.set_defaults(fn=_cmd_finetune)

    return p


def main(argv=None) -> int:
    args = make_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
