#!/usr/bin/env python3
"""Doc-consistency gate: every qNN cited in COVERAGE.md must exist in the
registry (as dumped by graft.Verify's oracle_sql.json + output dirs), and
every registered query must be cited somewhere in COVERAGE.md."""
import json, re, sys, glob

def main(verify_dir):
    registered = {d.split("/")[-1].split("_")[0]
                  for d in glob.glob(f"{verify_dir}/q*") if "." not in d.split("/")[-1]}
    cov = open("COVERAGE.md").read()
    cited = set(re.findall(r"\bq\d+[a-z]?\b", cov))
    missing_in_registry = sorted(c for c in cited if c not in registered)
    uncited = sorted(r for r in registered if r not in cited)
    if missing_in_registry:
        print("CITED BUT NOT REGISTERED:", missing_in_registry)
    if uncited:
        print("REGISTERED BUT UNCITED:", uncited)
    print(f"== {len(registered)} registered, {len(cited)} cited, "
          f"{len(missing_in_registry)} dangling, {len(uncited)} uncited ==")
    return 1 if missing_in_registry else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_h32"))
