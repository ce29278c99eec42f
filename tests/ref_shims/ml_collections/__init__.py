"""Minimal test-only ``ml_collections.ConfigDict`` shim for running the actual
reference model (``modelFactory.py:2``, ``multiTemporalViewEncoder.py:3``) as a
parity oracle.  Supports the access patterns the reference uses: attribute and
item reads/writes, recursive wrapping of nested dicts (``cfg["patches"].size``).
Never imported by mumpy_tpu itself.
"""


class ConfigDict(dict):
    def __init__(self, initial=None):
        super().__init__()
        if initial:
            for k, v in dict(initial).items():
                self[k] = v

    def __setitem__(self, key, value):
        if isinstance(value, dict) and not isinstance(value, ConfigDict):
            value = ConfigDict(value)
        super().__setitem__(key, value)

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value
