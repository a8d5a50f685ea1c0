"""Package entry: ``python -m hessian_llm_vision_tpu <command> [flags...]``.

Dispatches to the CLI modules (the reference's ~30 scripts as config-driven
entries — docs/MIGRATION.md maps each script to its command here).
"""

from __future__ import annotations

import sys

COMMANDS = {
    "train": ("hessian_llm_vision_tpu.cli.train",
              "train a model (sgd/adam/raw/lanczos*/gn/ngd)"),
    "spectrum": ("hessian_llm_vision_tpu.cli.spectrum",
                 "Hessian/GGN/Fisher spectrum of a model or checkpoint"),
    "evaluate": ("hessian_llm_vision_tpu.cli.evaluate",
                 "per-batch loss sweep of a checkpoint"),
    "forget": ("hessian_llm_vision_tpu.cli.forget",
               "eigenbasis-projection forgetting experiment"),
    "sweep": ("hessian_llm_vision_tpu.cli.sweep", "in-process grid sweep"),
    "hpo": ("hessian_llm_vision_tpu.cli.hpo",
            "hyperparameter optimisation (optuna or random search)"),
    "devices-info": ("hessian_llm_vision_tpu.cli.devices_info",
                     "device/memory diagnostics"),
}


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        print("commands:")
        for name, (_, desc) in COMMANDS.items():
            print(f"  {name:13s} {desc}")
        print("\nper-command help: python -m hessian_llm_vision_tpu "
              "<command> --help")
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}; one of: {', '.join(COMMANDS)}",
              file=sys.stderr)
        return 2
    import importlib

    mod = importlib.import_module(COMMANDS[cmd][0])
    mod.main(rest)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
