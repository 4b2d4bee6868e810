"""Small utilities mirrored from the reference's transformers.utils.utility."""

import importlib


class LazyImport:
    """Defer a module import until first attribute access (reference:
    transformers/utils/utility.py LazyImport — used pervasively there to
    keep optional heavy deps off the import path)."""

    def __init__(self, module_name: str):
        self.module_name = module_name
        self._module = None

    def _load(self):
        if self._module is None:
            self._module = importlib.import_module(self.module_name)
        return self._module

    def __getattr__(self, name):
        return getattr(self._load(), name)

    def __call__(self, *args, **kwargs):
        return self._load()(*args, **kwargs)
