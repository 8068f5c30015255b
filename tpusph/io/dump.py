"""Trajectory dumps — LAMMPS ``dump atom`` / ``dump custom`` format
(src/dump_atom.cpp, dump_custom.cpp — SURVEY.md §2.8).

Output order is by particle tag (stable across the engine's cell re-sorts,
matching LAMMPS's id-ordered dumps with dump_modify sort id).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import numpy as np


class Dump:
    def __init__(self, id: str, style: str, every: int, path: str,
                 columns: Optional[List[str]] = None,
                 computes: Optional[Dict[str, tuple]] = None,
                 var_context=None):
        self.id = id
        self.style = style
        self.every = every
        self.path = path
        self.columns = columns or ["id", "type", "xs", "ys", "zs"]
        self.computes = computes or {}
        self.var_context = var_context  # Interpreter, for v_ atom variables
        self._file = None
        self._last_step = None

    def _ensure_file(self):
        if self._file is None:
            self._file = open(self.path, "w")
        return self._file

    def maybe_write(self, sim, state, istep: int):
        if self.every <= 0 or istep % self.every != 0 or istep == self._last_step:
            return
        self._last_step = istep
        self.write(sim, state, istep)

    def _column_data(self, sim, dev, order, box):
        lo = np.asarray(box.lo)
        length = np.asarray(box.hi) - lo
        # in dist mode dev.x is brick-local along the decomposition axis —
        # dumps must write global coordinates (CLAUDE.md invariant)
        x = sim._host_x(dev)[order]
        cols = {}
        for c in self.columns:
            if c == "id":
                cols[c] = np.asarray(dev.tag)[order]
            elif c == "type":
                cols[c] = np.asarray(dev.type)[order]
            elif c in ("x", "y", "z"):
                cols[c] = x[:, "xyz".index(c)]
            elif c in ("xs", "ys", "zs"):
                d = "xyz".index(c[0])
                cols[c] = (x[:, d] - lo[d]) / max(length[d], 1e-30)
            elif c in ("vx", "vy", "vz"):
                cols[c] = np.asarray(dev.v)[order][:, "xyz".index(c[1])]
            elif c in ("fx", "fy", "fz"):
                cols[c] = np.asarray(dev.f)[order][:, "xyz".index(c[1])]
            elif c == "mass":
                cols[c] = np.asarray(dev.rmass)[order]
            elif c.startswith("c_") and c[2:] in self.computes:
                _, field = self.computes[c[2:]]
                if field == "t":
                    cv = np.asarray(dev.cv)[order]
                    cols[c] = np.asarray(dev.e)[order] / np.where(cv > 0, cv, 1)
                else:
                    cols[c] = np.asarray(getattr(dev, field))[order]
            elif c in ("rho", "e", "cv"):
                cols[c] = np.asarray(getattr(dev, c))[order]
            elif c.startswith("v_") and self.var_context is not None:
                from tpusph.script import AtomVariable
                var = self.var_context.vars.get(c[2:])
                if isinstance(var, AtomVariable):
                    cols[c] = var.evaluate_atom(
                        self.var_context, self._atom_fields(dev, order, x))
                else:
                    cols[c] = np.full(len(order),
                                      self.var_context.var_value(c[2:]))
            else:
                raise ValueError(f"dump column '{c}' unsupported")
        return cols

    @staticmethod
    def _atom_fields(dev, order, x) -> Dict[str, np.ndarray]:
        """Per-atom env for atom-style variable expressions (globalized x)."""
        v = np.asarray(dev.v)[order]
        f = np.asarray(dev.f)[order]
        cv = np.asarray(dev.cv)[order]
        e = np.asarray(dev.e)[order]
        return dict(
            x=x[:, 0], y=x[:, 1], z=x[:, 2],
            vx=v[:, 0], vy=v[:, 1], vz=v[:, 2],
            fx=f[:, 0], fy=f[:, 1], fz=f[:, 2],
            rho=np.asarray(dev.rho)[order], e=e, cv=cv,
            temp=e / np.where(cv > 0, cv, 1.0),
            mass=np.asarray(dev.rmass)[order],
            type=np.asarray(dev.type)[order],
            id=np.asarray(dev.tag)[order],
        )

    def write(self, sim, state, istep: int):
        f = self._ensure_file()
        dev = jax.device_get(state)
        alive = (dev.type > 0) & dev.owned
        idx = np.nonzero(alive)[0]
        order = idx[np.argsort(dev.tag[idx], kind="stable")]
        box = sim.box
        if self.style == "xyz":
            # dump_xyz.cpp format: natoms, comment, then "type x y z" rows
            x = sim._host_x(dev)[order]
            t = np.asarray(dev.type)[order]
            f.write(f"{len(order)}\n")
            f.write(f"Atoms. Timestep: {istep}\n")
            for i in range(len(order)):
                f.write(f"{t[i]} {x[i,0]:.8g} {x[i,1]:.8g} {x[i,2]:.8g}\n")
            f.flush()
            return
        bchar = ["pp" if p else "ff" for p in box.periodic]
        f.write("ITEM: TIMESTEP\n%d\n" % istep)
        f.write("ITEM: NUMBER OF ATOMS\n%d\n" % len(order))
        f.write("ITEM: BOX BOUNDS %s %s %s\n" % tuple(bchar))
        lo = np.asarray(box.lo)
        hi = np.asarray(box.hi)
        for d in range(3):
            f.write("%.9g %.9g\n" % (lo[d], hi[d]))
        cols = self.columns if self.style == "custom" \
            else ["id", "type", "xs", "ys", "zs"]
        self.columns = cols
        f.write("ITEM: ATOMS %s\n" % " ".join(cols))
        data = self._column_data(sim, dev, order, box)
        mat = np.column_stack([data[c] for c in cols]).astype(np.float32)
        ints = [i for i, c in enumerate(cols) if c in ("id", "type")]
        from tpusph import native
        txt = native.format_dump_rows(mat, ints)
        if txt is not None:
            f.write(txt)
        else:  # no toolchain: Python fallback, same format
            for row in mat:
                parts = [("%d" % row[i]) if i in ints else ("%.8g" % row[i])
                         for i in range(len(cols))]
                f.write(" ".join(parts) + "\n")
        f.flush()

    def close(self):
        if self._file:
            self._file.close()
            self._file = None
