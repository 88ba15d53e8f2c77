"""Import-only stub: the reference imports cvxpy at maxsetpack.py:4 but never
uses it (no LP fallback exists in the snapshot — see SURVEY.md §2)."""


def __getattr__(name):
    raise NotImplementedError(f'refshim cvxpy stub has no attribute {name!r}')
