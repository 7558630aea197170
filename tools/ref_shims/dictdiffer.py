"""Minimal `dictdiffer` stand-in (diff only) for fixture generation."""


def diff(first, second, node=None):
    node = node or []
    dotted = ".".join(str(n) for n in node)
    if isinstance(first, dict) and isinstance(second, dict):
        added = [k for k in second if k not in first]
        removed = [k for k in first if k not in second]
        if added:
            yield ("add", dotted, [(k, second[k]) for k in added])
        if removed:
            yield ("remove", dotted, [(k, first[k]) for k in removed])
        for k in first:
            if k in second:
                yield from diff(first[k], second[k], node + [k])
    else:
        if first != second:
            yield ("change", dotted, (first, second))
