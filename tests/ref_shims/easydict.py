"""Minimal easydict shim for importing the reference's config module
(``configs/davis/config.py:10``) without the easydict package."""


def _wrap(v):
    if isinstance(v, dict) and not isinstance(v, EasyDict):
        return EasyDict(v)
    if isinstance(v, (list, tuple)):
        return type(v)(_wrap(x) for x in v)
    return v


class EasyDict(dict):
    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d:
            for k, v in dict(d).items():
                self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def __setitem__(self, k, v):
        v = _wrap(v)
        super().__setitem__(k, v)
        super().__setattr__(k, v)

    __setattr__ = __setitem__

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)
