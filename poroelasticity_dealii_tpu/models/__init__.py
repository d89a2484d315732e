"""Problem setups and the host-side run loop (the reference's ``run()``
decomposed into: build -> init -> step loop -> output)."""

from .runner import SimulationRunner, run_from_deck  # noqa: F401
