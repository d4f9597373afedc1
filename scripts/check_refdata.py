#!/usr/bin/env python3
"""Independent cross-check of the q_ref_* recorded-literal oracles.

The q_ref_* gates run this engine (Scala/JTS) over the reference's REAL
golden Arrow files and pin the outputs as DuckDB VALUES literals. This
script recomputes every pinned number in pure Python (own WKB parser,
shoelace area, area-weighted centroid, Andrew monotone-chain hull,
ray-casting point-in-polygon) from the same reference bytes, executes the
recorded SQL in DuckDB, and compares:

  - counts / strings / booleans: exact
  - integer micro-unit measures: within 1 quantum (the two implementations
    sum floats in different orders; 1 micro-unit ~ 1e-6 deg / 1e-3 ft^2,
    orders of magnitude above IEEE noise, far below any real error)

Usage: python3 scripts/check_refdata.py [sql_dir]
  sql_dir: directory of <name>.sql recorded-oracle files (default: extract
  the live ones from /tmp/verify_out/oracle_sql.json if present, else
  /tmp/refdata_oracle).
"""
import io, json, math, os, struct, sys
import duckdb

REF = "/root/reference"
DATASETS = f"{REF}/py-geopolars/python/geopolars/datasets"


# ---------- pure-python geometry (independent of JTS) ----------

def parse_wkb(b):
    """WKB -> list of polygons [rings [(x, y)]] or [[ [pt] ]] for points."""
    pos = 0
    def rd(fmt, sz):
        nonlocal pos
        v = struct.unpack_from(("<" if le else ">") + fmt, b, pos)
        pos += sz
        return v
    le = b[pos] == 1; pos += 1
    t, = rd("I", 4)
    base = t % 1000
    if base == 1:
        return [[[rd("dd", 16)]]]
    if base == 3:
        nr, = rd("I", 4)
        return [[[rd("dd", 16) for _ in range(rd("I", 4)[0])] for _ in range(nr)]]
    if base == 6:
        n, = rd("I", 4)
        polys = []
        for _ in range(n):
            le = b[pos] == 1; pos += 1
            t2, = rd("I", 4); assert t2 % 1000 == 3
            nr, = rd("I", 4)
            polys.append([[rd("dd", 16) for _ in range(rd("I", 4)[0])] for _ in range(nr)])
        return polys
    raise ValueError(f"geom type {base}")


def ring_area2(r):
    s = 0.0
    for i in range(len(r) - 1):
        (x1, y1), (x2, y2) = r[i], r[i + 1]
        s += x1 * y2 - x2 * y1
    return s  # 2x signed area


def poly_area(polys):
    return sum(abs(ring_area2(p[0])) / 2 - sum(abs(ring_area2(h)) / 2 for h in p[1:])
               for p in polys)


def poly_centroid(polys):
    ax = ay = aw = 0.0
    for p in polys:
        for k, ring in enumerate(p):
            a2 = ring_area2(ring)
            sgn = (1 if k == 0 else -1) * (1 if a2 >= 0 else -1)
            cx = cy = 0.0
            for i in range(len(ring) - 1):
                (x1, y1), (x2, y2) = ring[i], ring[i + 1]
                cr = x1 * y2 - x2 * y1
                cx += (x1 + x2) * cr
                cy += (y1 + y2) * cr
            # cx/cy are 6*A-weighted; accumulate with orientation folded in
            ax += sgn * abs_or_keep(cx, a2)
            ay += sgn * abs_or_keep(cy, a2)
            aw += sgn * abs(a2)
    return ax / (3 * aw), ay / (3 * aw)


def abs_or_keep(c, a2):
    # centroid numerator carries the ring's own orientation; normalize so a
    # CW exterior contributes the same as a CCW one
    return c if a2 >= 0 else -c


def convex_hull_area(pts):
    pts = sorted(set(pts))
    if len(pts) < 3:
        return 0.0
    def half(ps):
        h = []
        for p in ps:
            while len(h) >= 2 and ((h[-1][0]-h[-2][0])*(p[1]-h[-2][1]) -
                                   (h[-1][1]-h[-2][1])*(p[0]-h[-2][0])) <= 0:
                h.pop()
            h.append(p)
        return h
    lower, upper = half(pts), half(list(reversed(pts)))
    hull = lower[:-1] + upper[:-1]
    hull.append(hull[0])
    return abs(ring_area2(hull)) / 2


def point_in_ring(x, y, ring):
    inside = False
    for i in range(len(ring) - 1):
        (x1, y1), (x2, y2) = ring[i], ring[i + 1]
        if (y1 > y) != (y2 > y):
            xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if x < xint:
                inside = not inside
    return inside


def point_in_polys(x, y, polys):
    for p in polys:
        if point_in_ring(x, y, p[0]) and not any(point_in_ring(x, y, h) for h in p[1:]):
            return True
    return False


def micro(x):
    return math.floor(x * 1e6 + 0.5)


def read_arrow(path):
    import pyarrow.ipc as ipc
    return ipc.open_file(path).read_all()


# ---------- recompute each gate ----------

def compute_ref_cities():
    out = {}
    for nm, path in [("cities", f"{REF}/data/cities.arrow"),
                     ("naturalearth_cities", f"{DATASETS}/naturalearth_cities.arrow")]:
        t = read_arrow(path)
        sx = sy = stx = sty = 0
        for g in t.column("geometry"):
            (x, y), = parse_wkb(g.as_py())[0][0]
            sx += micro(x); sy += micro(y)
            stx += micro(x + 10.0); sty += micro(y + 10.0)
        out[nm] = dict(n=t.num_rows, sum_x_micro=sx, sum_y_micro=sy,
                       sum_tx_micro=stx, sum_ty_micro=sty)
    return out


def lcc2263_inverse(x_usft, y_usft):
    """Pure-Python Snyder §15 LCC-2SP inverse for EPSG:2263 (NAD83 / New
    York Long Island, US survey feet) — written from the book's equations
    15-1..15-11, independent of the Scala kernel."""
    a, f = 6378137.0, 1.0 / 298.257222101          # GRS80
    e2 = f * (2 - f); e = math.sqrt(e2)
    usft = 1200.0 / 3937.0
    lat0, lon0 = math.radians(40 + 10 / 60.0), math.radians(-74.0)
    lat1, lat2 = math.radians(40 + 40 / 60.0), math.radians(41 + 2 / 60.0)
    fe, fn = 984250.0 * usft, 0.0

    def m(phi):
        return math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) ** 2)

    def tf(phi):
        s = math.sin(phi)
        return math.tan(math.pi / 4 - phi / 2) / ((1 - e * s) / (1 + e * s)) ** (e / 2)

    n = (math.log(m(lat1)) - math.log(m(lat2))) / (math.log(tf(lat1)) - math.log(tf(lat2)))
    F = m(lat1) / (n * tf(lat1) ** n)
    rho0 = a * F * tf(lat0) ** n
    x = x_usft * usft - fe
    y = rho0 - (y_usft * usft - fn)
    rho = math.copysign(math.hypot(x, y), n)
    tprime = (rho / (a * F)) ** (1.0 / n)
    lam = math.atan2(x, y) / n + lon0
    phi = math.pi / 2 - 2 * math.atan(tprime)
    for _ in range(12):
        s = math.sin(phi)
        phi = math.pi / 2 - 2 * math.atan(tprime * ((1 - e * s) / (1 + e * s)) ** (e / 2))
    return math.degrees(lam), math.degrees(phi)


def compute_ref_nybb():
    t = read_arrow(f"{DATASETS}/nybb.arrow")
    out = {}
    for i in range(t.num_rows):
        g = parse_wkb(t.column("geometry")[i].as_py())
        area = poly_area(g)
        cx, cy = poly_centroid(g)
        pts = [pt for p in g for r in p for pt in r]
        ext_len = sum(math.hypot(r[j+1][0]-r[j][0], r[j+1][1]-r[j][1])
                      for p in g for r in p[:1] for j in range(len(r)-1))
        sa = t.column("Shape_Area")[i].as_py(); sl = t.column("Shape_Leng")[i].as_py()
        out[t.column("BoroName")[i].as_py()] = dict(
            boro_code=t.column("BoroCode")[i].as_py(),
            area_milli=math.floor(area * 1e3 + 0.5),
            cx_micro=micro(cx), cy_micro=micro(cy),
            hull_milli=math.floor(convex_hull_area(pts) * 1e3 + 0.5),
            n_parts=len(g),
            esri_area_ok=abs(area / sa - 1) < 5e-6,
            esri_len_ok=abs(ext_len / sl - 1) < 1e-4,
            clon_micro=micro(lcc2263_inverse(cx, cy)[0]),
            clat_micro=micro(lcc2263_inverse(cx, cy)[1]))
    return out


def compute_ref_countries():
    t = read_arrow(f"{DATASETS}/naturalearth_lowres.arrow")
    agg = {}
    for i in range(t.num_rows):
        g = parse_wkb(t.column("geometry")[i].as_py())
        cont = t.column("continent")[i].as_py()
        xs = [pt[0] for p in g for r in p for pt in r]
        ys = [pt[1] for p in g for r in p for pt in r]
        a = agg.setdefault(cont, dict(n=0, sum_area_micro=0, minx=1e99, maxy=-1e99,
                                      pop=0, iso=set()))
        a["n"] += 1
        a["sum_area_micro"] += micro(poly_area(g))
        a["minx"] = min(a["minx"], min(xs)); a["maxy"] = max(a["maxy"], max(ys))
        a["pop"] += math.floor(t.column("pop_est")[i].as_py())
        a["iso"].add(t.column("iso_a3")[i].as_py())
    return {c: dict(n=a["n"], sum_area_micro=a["sum_area_micro"],
                    minx_micro=micro(a["minx"]), maxy_micro=micro(a["maxy"]),
                    pop=a["pop"], n_iso=len(a["iso"])) for c, a in agg.items()}


def compute_ref_sjoin():
    cities = read_arrow(f"{DATASETS}/naturalearth_cities.arrow")
    countries = read_arrow(f"{DATASETS}/naturalearth_lowres.arrow")
    polys = [(countries.column("name")[i].as_py(),
              parse_wkb(countries.column("geometry")[i].as_py()))
             for i in range(countries.num_rows)]
    per_country = {}
    for i in range(cities.num_rows):
        (x, y), = parse_wkb(cities.column("geometry")[i].as_py())[0][0]
        nm = cities.column("name")[i].as_py()
        for cname, g in polys:
            if point_in_polys(x, y, g):
                per_country.setdefault(cname, []).append(nm)
    return {c: dict(n_cities=len(v), first_city=min(v), last_city=max(v))
            for c, v in per_country.items()}


# ---------- compare against the recorded oracle SQL ----------

INT_QUANTUM_COLS = {"sum_x_micro", "sum_y_micro", "sum_tx_micro", "sum_ty_micro",
                    "area_milli", "cx_micro", "cy_micro", "hull_milli",
                    "sum_area_micro", "minx_micro", "maxy_micro"}


def load_sqls(sql_dir):
    names = ["q_ref_cities", "q_ref_nybb", "q_ref_countries", "q_ref_sjoin"]
    oj = "/tmp/verify_out/oracle_sql.json"
    if sql_dir is None and os.path.exists(oj):
        all_sql = json.load(open(oj))
        if all(n in all_sql for n in names):
            return {n: all_sql[n] for n in names}
    d = sql_dir or "/tmp/refdata_oracle"
    return {n: io.open(f"{d}/{n}.sql", encoding="utf-8").read() for n in names}


def main():
    sql_dir = sys.argv[1] if len(sys.argv) > 1 else None
    sqls = load_sqls(sql_dir)
    computed = {
        "q_ref_cities": ("dataset", compute_ref_cities()),
        "q_ref_nybb": ("boro_name", compute_ref_nybb()),
        "q_ref_countries": ("continent", compute_ref_countries()),
        "q_ref_sjoin": ("country", compute_ref_sjoin()),
    }
    fails = 0
    for name, (keycol, mine) in computed.items():
        df = duckdb.connect().execute(sqls[name]).df()
        if len(df) != len(mine):
            print(f"FAIL {name}: {len(df)} recorded rows vs {len(mine)} computed")
            fails += 1
            continue
        bad = 0
        for _, row in df.iterrows():
            key = row[keycol]
            if key not in mine:
                print(f"  {name}: recorded key {key!r} missing from computed"); bad += 1
                continue
            for col, val in mine[key].items():
                rec = row[col]
                ok = (abs(int(rec) - int(val)) <= 1 if col in INT_QUANTUM_COLS
                      else (bool(rec) == bool(val) if isinstance(val, bool)
                            else str(rec) == str(val) or int(rec) == int(val)
                            if not isinstance(val, str) else rec == val))
                if not ok:
                    print(f"  {name}[{key!r}].{col}: recorded {rec!r} != computed {val!r}")
                    bad += 1
        if bad:
            print(f"FAIL {name}: {bad} mismatches"); fails += 1
        else:
            print(f"ok   {name} ({len(df)} rows, independent recompute agrees)")
    print(f"\n{len(computed)-fails}/{len(computed)} reference-data oracles verified")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
