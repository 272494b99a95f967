"""``python -m supertonic_tpu`` runs the CLI (reference example flags)."""

from .serve.cli import main

main()
