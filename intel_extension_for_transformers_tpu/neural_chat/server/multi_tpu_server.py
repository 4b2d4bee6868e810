"""Multi-host TPU serving launcher.

The analogue of the reference's multi-process launchers
(reference: neural_chat/server/multi_cpu_server.py — mpirun + deepspeed
AutoTP over oneCCL :204-249; multi_hpu_server.py — HCCL). On TPU pods the
whole ceremony collapses to `jax.distributed.initialize()` + a tensor-
parallel mesh over all chips: every host runs THIS same script, JAX wires
the ICI/DCN topology, and the model shards once over the global mesh. Host 0
serves HTTP; other hosts participate in every collective through the SPMD
programs.

    # on every host of the slice (TPU runtime sets the env):
    python -m intel_extension_for_transformers_tpu.neural_chat.server.multi_tpu_server \
        --config_file neuralchat.yaml

Single-host multi-chip works the same way without --coordinator.
"""

from __future__ import annotations

import argparse
import logging

logger = logging.getLogger(__name__)


def main(argv=None):
    p = argparse.ArgumentParser("multi_tpu_server")
    p.add_argument("--config_file", required=True)
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (omit on single-host or when "
                        "the TPU runtime provides it)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--tensor_parallel", type=int, default=0,
                   help="0 = all devices")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax

    if args.coordinator or args.num_processes:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    else:
        try:
            jax.distributed.initialize()  # TPU runtime auto-config
        except Exception as e:  # single-process fallback
            logger.info("single-process mode (%s)", e)

    n = len(jax.devices())
    tp = args.tensor_parallel or n
    logger.info(
        "process %d/%d, %d global devices, tp=%d",
        jax.process_index(), jax.process_count(), n, tp,
    )

    import yaml

    from intel_extension_for_transformers_tpu.neural_chat.server import (
        NeuralChatServerExecutor,
    )

    with open(args.config_file) as f:
        config = yaml.safe_load(f)
    # shard the model over the global mesh: world_size=dp, tensor_parallel=tp
    loading = dict(config.get("loading_config") or {})
    loading.setdefault("tensor_parallel", tp)
    loading.setdefault("world_size", n // tp)
    config["loading_config"] = loading

    executor = NeuralChatServerExecutor()
    if not executor.init(config):
        raise RuntimeError("server init failed")
    if jax.process_index() == 0:
        executor.run()  # serve on host 0; collectives fan out via SPMD
    else:
        # non-zero hosts just keep the runtime alive for collectives
        import time

        logger.info("worker host: participating in collectives")
        while True:
            time.sleep(60)


if __name__ == "__main__":
    main()
