"""Framework error types (host Framework.ModelError/RendererError/
ExtensionError equivalents — reference usage: Model.py:159, Renderer.py:25,
FasterGSCudaBackend/__init__.py:20)."""


class FrameworkError(Exception):
    """Base class for framework errors."""


class ModelError(FrameworkError):
    pass


class RendererError(FrameworkError):
    pass


class ExtensionError(FrameworkError):
    pass


class DatasetError(FrameworkError):
    pass
