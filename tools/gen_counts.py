#!/usr/bin/env python
"""Single source of truth for documented test/query counts (VERDICT r3
#9: counts drifted across STATUS/README/commits because they were
hand-written). Collects the real numbers — pytest collection count and
the __spark_entry__ registry sizes — and rewrites every documented
occurrence in place. Run after adding tests or queries:

    python tools/gen_counts.py        # rewrite docs
    python tools/gen_counts.py --check  # exit 1 if docs are stale
"""

import re
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def collected_tests() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True, text=True, cwd=REPO, timeout=600,
    )
    m = re.search(r"(\d+) tests collected", out.stdout)
    if not m:
        raise RuntimeError(f"cannot parse pytest collection: {out.stdout[-500:]}")
    return int(m.group(1))


def registry_counts() -> tuple[int, int]:
    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    return len(E.queries()), len(E.oracle_sql())


def rewrite(path: str, subs: list[tuple[str, str]], check: bool) -> bool:
    with open(path) as fh:
        s = fh.read()
    new = s
    for pat, repl in subs:
        new = re.sub(pat, repl, new)
    if new != s:
        if not check:
            with open(path, "w") as fh:
                fh.write(new)
        return True
    return False


def main() -> None:
    check = "--check" in sys.argv
    n_tests = collected_tests()
    n_q, n_o = registry_counts()
    assert n_q == n_o, f"queries ({n_q}) != oracles ({n_o})"
    subs = [
        (r"Test count: \d+ \(generated[^)]*\)\.",
         f"Test count: {n_tests} (generated — tools/gen_counts.py)."),
        (r"\b\d+ pytest\s+cases", f"{n_tests} pytest cases"),
        (r"\b\d+ registry queries", f"{n_q} registry queries"),
        (r"\b\d+/\d+ DuckDB-oracle-checked", f"{n_q}/{n_q} DuckDB-oracle-checked"),
        (r"the \d+-query surface", f"the {n_q}-query surface"),
        (r"a \d+-query DuckDB oracle", f"a {n_q}-query DuckDB oracle"),
        (r"Registry is now \d+ queries / \d+ oracles",
         f"Registry is now {n_q} queries / {n_o} oracles"),
    ]
    stale = []
    for doc in ("STATUS.md", "README.md", ".claude/skills/verify/SKILL.md"):
        if rewrite(os.path.join(REPO, doc), subs, check):
            stale.append(doc)
    print(f"tests={n_tests} queries={n_q} oracles={n_o} "
          f"{'STALE' if check else 'updated'}: {stale or 'none'}")
    if check and stale:
        sys.exit(1)


if __name__ == "__main__":
    main()
