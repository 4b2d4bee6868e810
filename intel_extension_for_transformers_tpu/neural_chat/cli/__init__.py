from intel_extension_for_transformers_tpu.neural_chat.cli.cli_commands import (
    main,
    make_parser,
)

__all__ = ["main", "make_parser"]
