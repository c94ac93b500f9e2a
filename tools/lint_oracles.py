#!/usr/bin/env python3
"""Oracle lint: version-sensitive SQL constructs in DuckDB oracle strings.

The r7 lesson (q74 round 6, then q167/q181/q183 round 7): the driver runs
a DIFFERENT DuckDB version than the local 1.0.0, so any oracle construct
whose result depends on engine float policy — quantile interpolation,
ROUND over a float quotient, float→string formatting, double→decimal tie
rounding — can pass bit-exact locally at every scale and still go red at
the driver's hash gate. This lint greps every triple-quoted oracle SQL
string in src/main/scala for those construct classes and fails on any
site not in the reviewed allowlist (tools/oracle_lint_allow.txt).

Rules
  QUANTILE   quantile_cont/quantile_disc/percentile_* / percentile( —
             engine interpolation policy; spell out the order-statistic
             arithmetic instead (q183/q194 pattern).
  ROUNDDIV   ROUND(expr, n) whose argument contains a '/' — rounding a
             float quotient; use exact integer/decimal arithmetic
             (q167 ppm pattern) or round both sides from exact moments.
  FLOATSTR   CAST(... AS VARCHAR)/::VARCHAR — float→string formatting is
             shortest-round-trip-vs-fixed and version-dependent.
  APPROX     approx_*/histogram( — sketch internals are not a contract.
  DOUBLEOUT  CAST(... AS DOUBLE) — allowed ONLY for values derived from
             exact integer/decimal moments where the cast is the single
             correctly-rounded conversion (the q145/q191 route) or a
             1-ulp-gap-free sum; every such site must be allowlisted.

Allowlist format: "<query_name> <RULE>" per line, '#' comments.
Usage: python3 tools/lint_oracles.py   (exit 1 on unallowed hits)
"""
import os, re, sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "src", "main", "scala")
ALLOW = os.path.join(ROOT, "tools", "oracle_lint_allow.txt")

RULES = [
    ("QUANTILE", re.compile(r"quantile_cont|quantile_disc|percentile_cont"
                            r"|percentile_disc|\bpercentile\s*\(", re.I)),
    ("FLOATSTR", re.compile(r"AS\s+VARCHAR|::VARCHAR", re.I)),
    ("APPROX", re.compile(r"\bapprox_\w+|\bhistogram\s*\(", re.I)),
    ("DOUBLEOUT", re.compile(r"AS\s+DOUBLE\s*\)", re.I)),
]


def round_over_div(sql):
    """True if any ROUND( argument span (balanced parens) contains '/'."""
    for m in re.finditer(r"\bROUND\s*\(", sql, re.I):
        depth, i = 1, m.end()
        while i < len(sql) and depth > 0:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            elif sql[i] == "/" and depth >= 1:
                return True
            i += 1
    return False


def oracle_strings():
    """Yield (query_name, sql) for each triple-quoted string lexically
    inside an oracled("name", ...) call (concatenated parts included)."""
    out = {}
    for dirpath, _, files in os.walk(SRC):
        for f in files:
            if not f.endswith(".scala"):
                continue
            text = open(os.path.join(dirpath, f)).read()
            # split at each oracled( call; the span runs to the body lambda
            for m in re.finditer(
                    r'oracled\(\s*\n?\s*s?"([^"]+)"', text):
                name = m.group(1)
                # span ends at the query body opener ') { (s' or
                # ') {\n    (s' — find the first '{ (' after the call
                end = text.find(") {", m.end())
                span = text[m.end():end if end > 0 else m.end() + 4000]
                sqls = re.findall(r'"""(.*?)"""', span, re.S)
                if sqls:
                    out[name] = out.get(name, "") + "\n".join(sqls)
    # named oracle-CTE vals shared by query + probe (concatenation means
    # the probe span may miss the CTE text; lint the val bodies too)
    for dirpath, _, files in os.walk(SRC):
        for f in files:
            if not f.endswith(".scala"):
                continue
            text = open(os.path.join(dirpath, f)).read()
            for m in re.finditer(
                    r'val (\w*[Oo]racle\w*)\s*=\s*\n?\s*"""(.*?)"""',
                    text, re.S):
                out[f"<shared:{m.group(1)}>"] = m.group(2)
    return out


def main():
    allow = set()
    if os.path.exists(ALLOW):
        for line in open(ALLOW):
            line = line.split("#")[0].strip()
            if line:
                allow.add(tuple(line.split()))
    bad = []
    for name, sql in sorted(oracle_strings().items()):
        hits = [r for r, pat in RULES if pat.search(sql)]
        if round_over_div(sql):
            hits.append("ROUNDDIV")
        for rule in hits:
            if (name, rule) not in allow:
                bad.append((name, rule))
    if bad:
        print("ORACLE LINT FAIL — version-sensitive constructs not in "
              "tools/oracle_lint_allow.txt:")
        for name, rule in bad:
            print(f"  {name} {rule}")
        sys.exit(1)
    print(f"oracle lint ok ({len(oracle_strings())} oracles scanned)")


if __name__ == "__main__":
    main()
