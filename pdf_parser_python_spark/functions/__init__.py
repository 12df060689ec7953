from . import anchors  # noqa: F401
