from . import anchors, boxes, losses, riou, targets  # noqa: F401
