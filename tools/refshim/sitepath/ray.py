"""Serial in-process stand-in for the ``ray`` API surface the reference uses.

The reference (/root/reference/superdsm) fans out work with
``ray.remote``/``ray.put``/``ray.get``/``ray.wait`` (see e.g.
``objects.py:215,275-281`` and ``_aux.py:44-48``).  This shim executes every
remote call eagerly in-process so the *unmodified* reference pipeline can run
in an environment without ray.  Results are bitwise identical to a serial ray
run because the reference's tasks are pure functions of their arguments.
"""


class ObjectRef:
    __slots__ = ('value',)

    def __init__(self, value):
        self.value = value


def put(value):
    return ObjectRef(value)


def get(ref):
    if isinstance(ref, ObjectRef):
        return ref.value
    if isinstance(ref, (list, tuple)):
        return type(ref)(get(r) for r in ref)
    return ref


def wait(refs, num_returns=1, **kwargs):
    return list(refs[:num_returns]), list(refs[num_returns:])


def init(*args, **kwargs):
    return None


def shutdown(*args, **kwargs):
    return None


def is_initialized():
    return True


class _RemoteFunction:
    def __init__(self, fn):
        self._fn = fn

    def remote(self, *args, **kwargs):
        args = [get(a) for a in args]
        kwargs = {k: get(v) for k, v in kwargs.items()}
        return ObjectRef(self._fn(*args, **kwargs))


def remote(*args, **kwargs):
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return _RemoteFunction(args[0])

    def decorator(fn):
        return _RemoteFunction(fn)

    return decorator
