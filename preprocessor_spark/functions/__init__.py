from . import categorical, datetime_fn, numerical  # noqa: F401
