import sys

from intel_extension_for_transformers_tpu.neural_chat.cli.cli_commands import main

sys.exit(main())
