"""Placeholder public API module (filled in by the deploy layer milestone)."""


class YoloLite:  # pragma: no cover - replaced later this round
    def __init__(self, *a, **k):
        raise NotImplementedError("YoloLite API lands with the deploy milestone")
