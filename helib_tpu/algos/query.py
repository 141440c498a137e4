"""Encrypted database lookup: Database / QueryExpr.

TPU-native equivalent of reference partialMatch/query
(/root/reference/src/partialMatch.cpp, include/helib/query.h:85-220,
partialMatch.h:213-300): an encrypted database of column vectors, query
expressions And/Or/Not compiled to weighted-CNF scoring, and
contains/getScore via slot-wise equality testing (mapTo01).
"""

from __future__ import annotations

import numpy as np

from .eqtesting import map_to_01


# -- query AST (reference query.h) ------------------------------------------

class QueryExpr:
    def __and__(self, other):
        return And(self, other)

    def __or__(self, other):
        return Or(self, other)

    def __invert__(self):
        return Not(self)


class Col(QueryExpr):
    def __init__(self, index: int):
        self.index = index


class And(QueryExpr):
    def __init__(self, a, b):
        self.a, self.b = a, b


class Or(QueryExpr):
    def __init__(self, a, b):
        self.a, self.b = a, b


class Not(QueryExpr):
    def __init__(self, a):
        self.a = a


def make_query(index: int) -> Col:
    return Col(index)


# -- database ----------------------------------------------------------------

class Database:
    """Columns of encrypted slot vectors; one DB record per slot
    (reference Database<TXT>, partialMatch.h:213)."""

    def __init__(self, ea, sk, columns: list):
        self.ea = ea
        self.sk = sk
        self.columns = columns          # list of Ctxt (or Ptxt arrays)

    def _match_column(self, col_ct, query_ct):
        """Slot-wise equality indicator: 1 - mapTo01(col - query)."""
        diff = col_ct.copy().sub(query_ct)
        nz = map_to_01(self.ea, diff, self.sk)          # 1 iff different
        one = nz.copy()
        one.mul_constant_poly(np.zeros(1, dtype=np.int64))
        one.add_constant_poly(np.ones(1, dtype=np.int64))
        return one.sub(nz)                              # 1 iff equal

    def _eval(self, expr: QueryExpr, query_cols: dict):
        if isinstance(expr, Col):
            return self._match_column(self.columns[expr.index],
                                      query_cols[expr.index])
        if isinstance(expr, And):
            a = self._eval(expr.a, query_cols)
            b = self._eval(expr.b, query_cols)
            return a.multiply(b, self.sk)
        if isinstance(expr, Or):
            a = self._eval(expr.a, query_cols)
            b = self._eval(expr.b, query_cols)
            ab = a.copy().multiply(b, self.sk)
            return a.add(b).sub(ab)                     # a+b-ab
        if isinstance(expr, Not):
            a = self._eval(expr.a, query_cols)
            one = a.copy()
            one.mul_constant_poly(np.zeros(1, dtype=np.int64))
            one.add_constant_poly(np.ones(1, dtype=np.int64))
            return one.sub(a)
        raise TypeError(type(expr))

    def contains(self, expr: QueryExpr, query_cols: dict):
        """Indicator ciphertext: slot i is 1 iff record i matches
        (reference Database::contains)."""
        return self._eval(expr, query_cols)

    def get_score(self, weights: list, query_cols: dict, offset: int = 0):
        """Weighted sum of per-column matches (reference getScore)."""
        acc = None
        for i, w in enumerate(weights):
            if w == 0:
                continue
            t = self._match_column(self.columns[i], query_cols[i])
            t.mul_constant_poly(np.array([w], dtype=np.int64))
            acc = t if acc is None else acc.add(t)
        if offset and acc is not None:
            acc.add_constant_poly(np.array([offset], dtype=np.int64))
        return acc
