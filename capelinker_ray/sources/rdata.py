"""Minimal reader for R ``.rda`` / ``.RData`` workspaces (RDX2/RDX3).

The reference ships its record tables as lazy-loaded ``.rda`` data
(`/root/reference/data/rein.rda` etc., DESCRIPTION:18 ``LazyData: true``);
this source reads them straight into pandas so the engine can ingest the
reference's native format without R — the ``data(rein)`` analog of
SURVEY §2.1.

Implements the publicly documented R serialization format ("R Internals"
§ Serialization Formats): gzip (or plain) stream, ``RDX2``/``RDX3`` magic,
XDR (big-endian) items. Covers the SEXP types R data frames need — LISTSXP
/ VECSXP / STRSXP / CHARSXP / INTSXP / REALSXP / LGLSXP / SYMSXP / REFSXP
/ NILVALUE, attributes, factors (decoded to strings), version-3 ALTREP
compact integer sequences (compact row.names) — and errors loudly on
anything else.
"""

from __future__ import annotations

import bz2
import gzip
import lzma
import struct

import numpy as np
import pandas as pd

__all__ = ["read_rda", "rda_dataset", "r_value", "r_attrs",
           "r_list_to_dict"]

_NA_INT = -2147483648


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.p = 0
        self.refs: list = []

    def bytes(self, n: int) -> bytes:
        b = self.d[self.p:self.p + n]
        self.p += n
        return b

    def i4(self) -> int:
        return struct.unpack(">i", self.bytes(4))[0]

    def ints(self, n: int) -> np.ndarray:
        a = np.frombuffer(self.bytes(4 * n), dtype=">i4").astype(np.int64)
        return a

    def doubles(self, n: int) -> np.ndarray:
        return np.frombuffer(self.bytes(8 * n), dtype=">f8").astype(
            np.float64)

    # --- items ------------------------------------------------------------

    def item(self):
        flags = self.i4()
        typ = flags & 0xFF
        has_attr = bool(flags & 0x200)
        has_tag = bool(flags & 0x400)

        if typ == 0xFF:                       # REFSXP
            idx = flags >> 8
            if idx == 0:
                idx = self.i4()
            return self.refs[idx - 1]
        if typ == 0xFE:                       # NILVALUE
            return None
        if typ in (253, 252, 251, 250, 241, 242):
            # GLOBALENV / UNBOUNDVALUE / MISSINGARG / BASENAMESPACE /
            # BASEENV / EMPTYENV — opaque singletons
            return None
        if typ in (248, 249):                 # PACKAGESXP / NAMESPACESXP
            self.refs.append(None)
            self._string_vec()                # persistent name
            return None
        if typ == 1:                          # SYMSXP
            name = self.item()                # CHARSXP
            self.refs.append(name)
            return name
        if typ == 9:                          # CHARSXP
            n = self.i4()
            if n == -1:
                return None
            return self.bytes(n).decode("utf-8", errors="replace")
        if typ in (2, 6, 3, 5, 17, 240, 239):
            # pairlist-shaped: LISTSXP / LANGSXP / CLOSXP / PROMSXP /
            # DOTSXP (+ legacy ATTRLANGSXP/ATTRLISTSXP). For CLOSXP the
            # tag is the closure environment, car=formals, cdr=body.
            if typ in (240, 239):
                has_attr = True
            attr = self.item() if has_attr else None
            tag = self.item() if has_tag else None
            car = self.item()
            cdr = self.item()
            out = [(tag, car, attr)]
            if isinstance(cdr, list):
                out.extend(cdr)
            elif cdr is not None:
                out.append((None, cdr, None))
            return out
        if typ == 4:                          # ENVSXP
            self.refs.append(None)            # ref slot (placeholder)
            self.i4()                         # locked flag
            self.item()                       # enclosing env
            self.item()                       # frame
            self.item()                       # hash table
            self.item()                       # attributes
            return None
        if typ == 24:                         # RAWSXP
            n = self.i4()
            vals = self.bytes(n)
            return self._with_attr(vals, has_attr, typ)
        if typ == 21:                         # BCODESXP — skip bytecode
            self._read_bc()
            return None
        if typ == 25:                         # S4SXP
            attr_list = self.item() if has_attr else None
            return ("<S4>", attr_list)
        if typ in (10, 13):                   # LGLSXP / INTSXP
            n = self.i4()
            vals = self.ints(n)
            return self._with_attr(vals, has_attr, typ)
        if typ == 14:                         # REALSXP
            n = self.i4()
            vals = self.doubles(n)
            return self._with_attr(vals, has_attr, typ)
        if typ == 16:                         # STRSXP
            n = self.i4()
            vals = np.array([self.item() for _ in range(n)], dtype=object)
            return self._with_attr(vals, has_attr, typ)
        if typ == 19:                         # VECSXP (generic list)
            n = self.i4()
            vals = [self.item() for _ in range(n)]
            return self._with_attr(vals, has_attr, typ)
        if typ == 22:                         # EXTPTRSXP (e.g. data.table's
            self.refs.append(None)            # .internal.selfref) -> None
            self.item()                       # protected
            self.item()                       # tag
            if has_attr:
                self.item()
            return None
        if typ == 238:                        # ALTREP (RDX3 compact seqs)
            info = self.item()                # class info pairlist
            state = self.item()
            self.item()                       # attr
            cls = info[0][1] if isinstance(info, list) else None
            cls_name = cls[0] if isinstance(cls, tuple) else cls
            if isinstance(state, tuple):
                state = state[0]
            if cls_name in ("compact_intseq", "compact_realseq"):
                n, start, step = (float(x) for x in np.asarray(state))
                arr = start + step * np.arange(int(n))
                return arr.astype(np.int64 if cls_name == "compact_intseq"
                                  else np.float64)
            if cls_name in ("wrap_integer", "wrap_real", "wrap_string",
                            "wrap_logical"):
                # R serializes wrapper state as CONS(payload, metadata) —
                # a pairlist, parsed here as [(tag, car, attr), ...]. The
                # wrapped vector is the CAR of the first element (itself
                # possibly a (values, attrs) tuple — strip the attrs);
                # returning the raw pairlist would hand callers a list of
                # tuples instead of the vector (R >= 3.6 sorted wrappers).
                if (isinstance(state, list) and state
                        and isinstance(state[0], tuple)
                        and len(state[0]) == 3):
                    payload = state[0][1]
                    if isinstance(payload, tuple):
                        payload = payload[0]
                    return payload
                return state
            raise NotImplementedError(f"ALTREP class {cls_name!r}")
        raise NotImplementedError(f"SEXP type {typ} at offset {self.p - 4}")

    # --- bytecode skipping (serialize.c ReadBC/ReadBCConsts/ReadBCLang) --

    def _read_bc(self):
        self.i4()                             # rep-table length
        self._read_bc1()

    def _read_bc1(self):
        self.item()                           # code (INTSXP)
        n = self.i4()                         # constant-pool length
        for _ in range(n):
            t = self.i4()
            if t == 21:
                self._read_bc1()
            elif t in (2, 6, 239, 240, 243, 244):
                self._read_bclang(t)
            else:
                self.item()                   # t was the writer's pad int

    def _read_bclang(self, t: int):
        if t == 243:                          # BCREPREF
            self.i4()
            return
        if t in (244, 2, 6, 239, 240):
            if t == 244:                      # BCREPDEF
                self.i4()                     # rep position
                t = self.i4()
            if t in (239, 240):               # ATTR variants carry attrs
                self.item()
            self.item()                       # tag
            self._read_bclang(self.i4())      # car
            self._read_bclang(self.i4())      # cdr
            return
        self.item()                           # padded plain item

    def _string_vec(self):
        """Persistent-name string vector (PACKAGESXP/NAMESPACESXP)."""
        if self.i4() != 0:
            raise NotImplementedError("names in persistent strings")
        n = self.i4()
        return [self.item() for _ in range(n)]

    def _with_attr(self, vals, has_attr: bool, typ: int):
        if not has_attr:
            return (vals, None) if False else vals
        attr_list = self.item()               # pairlist of (tag, value)
        attrs = {}
        if isinstance(attr_list, list):
            for tag, car, _ in attr_list:
                attrs[tag] = car
        return (vals, attrs)


def _decompress(path: str) -> bytes:
    with open(path, "rb") as f:
        head = f.read(5)
    if head[:2] == b"\x1f\x8b":
        return gzip.open(path, "rb").read()
    if head[:3] == b"BZh":
        return bz2.open(path, "rb").read()
    if head[:5] == b"\xfd7zXZ":
        return lzma.open(path, "rb").read()
    with open(path, "rb") as f:
        return f.read()


def _strip(v):
    return v[0] if isinstance(v, tuple) else v


def _attrs(v) -> dict:
    return v[1] if isinstance(v, tuple) and isinstance(v[1], dict) else {}


def _to_frame(value) -> pd.DataFrame:
    cols = _strip(value)
    attrs = _attrs(value)
    names = list(_strip(attrs.get("names", [])))
    out = {}
    for name, col in zip(names, cols):
        cattrs = _attrs(col)
        cv = _strip(col)
        if "levels" in cattrs:                # factor -> strings
            levels = np.asarray(_strip(cattrs["levels"]), dtype=object)
            codes = np.asarray(cv, dtype=np.int64)
            vals = np.full(len(codes), None, dtype=object)
            ok = codes != _NA_INT
            vals[ok] = levels[codes[ok] - 1]
            out[name] = vals
        elif isinstance(cv, np.ndarray) and cv.dtype.kind == "i":
            iv = cv.astype(np.float64)
            iv[cv == _NA_INT] = np.nan
            # keep integer dtype when no NAs (persid, year)
            out[name] = (cv if not np.isnan(iv).any() else iv)
        else:
            out[name] = cv
    return pd.DataFrame(out)


def read_rda(path: str) -> dict:
    """.rda -> {object name: pandas DataFrame | numpy array | list}."""
    data = _decompress(path)
    if data[:5] not in (b"RDX2\n", b"RDX3\n"):
        raise ValueError(f"not an RDA file: {data[:5]!r}")
    r = _Reader(data[5:])
    if r.bytes(2) != b"X\n":
        raise ValueError("only XDR (binary big-endian) RDA is supported")
    version = r.i4()
    r.i4()                                    # writer version
    r.i4()                                    # min reader version
    if version >= 3:
        n = r.i4()
        r.bytes(n)                            # native encoding name
    top = r.item()                            # pairlist of (name, value)
    out = {}
    for tag, car, _ in top or []:
        attrs = _attrs(car)
        klass = list(_strip(attrs.get("class", []))) if attrs else []
        if "data.frame" in klass:
            out[tag] = _to_frame(car)
        else:
            # non-frame objects keep their (value, attrs) tuple — use
            # r_value / r_attrs to unwrap (class, names, dim, ...)
            out[tag] = car
    return out


def r_value(v):
    """Unwrap an R object to its value (drop attributes)."""
    return _strip(v)


def r_attrs(v) -> dict:
    """An R object's attribute dict ({} when none)."""
    return _attrs(v)


def r_list_to_dict(v) -> dict:
    """Named R list -> {name: element} (elements still wrapped)."""
    vals = _strip(v)
    names = list(_strip(_attrs(v).get("names", [])))
    return dict(zip(names, vals))


def rda_dataset(path: str, name: str | None = None):
    """.rda -> ray.data.Dataset of the (single or named) data frame."""
    import ray.data as rd
    objs = read_rda(path)
    if name is None:
        frames = {k: v for k, v in objs.items()
                  if isinstance(v, pd.DataFrame)}
        if len(frames) != 1:
            raise ValueError(f"pass name=; found {sorted(objs)}")
        name = next(iter(frames))
    return rd.from_pandas(objs[name])
