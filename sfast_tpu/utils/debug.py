"""Graph/op debugging aids.

Counterparts of the reference's AOT graph printer
(``utils/aot_printer.py:36-44``) and TorchDispatch ``LoggingMode``
(``utils/torch_dispatch.py:26-71``):

- :func:`print_jaxpr` / :func:`print_lowered` — dump the traced jaxpr or
  the lowered StableHLO of a function at given args;
- :func:`count_ops` — primitive histogram of a traced function (quick
  answer to "did my fusion pass kick in?" without reading HLO).
"""

from collections import Counter
from typing import Callable, Dict

import jax


def print_jaxpr(fn: Callable, *args, echo=print, **kwargs):
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    echo(jaxpr)
    return jaxpr


def print_lowered(fn: Callable, *args, echo=print, **kwargs) -> str:
    txt = jax.jit(fn).lower(*args, **kwargs).as_text()
    echo(txt)
    return txt


def count_ops(fn: Callable, *args, **kwargs) -> Dict[str, int]:
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    counts: Counter = Counter()

    def walk(jx):
        for eqn in jx.eqns:
            counts[eqn.primitive.name] += 1
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr)
                if isinstance(sub, (list, tuple)):
                    for s in sub:
                        if hasattr(s, "jaxpr"):
                            walk(s.jaxpr)

    walk(jaxpr.jaxpr)
    return dict(counts)
