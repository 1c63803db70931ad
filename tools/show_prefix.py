"""Print the graded-prefix order the driver will see, with history.

Usage: python tools/show_prefix.py [n]   (default 50)

For each of the first n queries() entries: its position, name, policy
class, and latest driver row (round + green/red), so the upcoming
rotation is inspectable without reading JSON by hand.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    import __spark_entry__ as E

    names = list(E._collect("QUERIES"))
    current_round, latest = E.grading_history()
    order = E.prefix_order(names)
    reg = {q: i for i, q in enumerate(names)}
    never = sum(1 for q in names if q not in latest)
    print(
        f"round {current_round}: {len(names)} registered, "
        f"{len(latest)} ever-graded, {never} never-graded\n"
    )
    cls_names = {0: "RED", 1: "CORE-REFRESH", 2: "never-graded", 3: "green"}
    for i, q in enumerate(order[:n]):
        key = E._policy_key(q, reg[q], current_round, latest)
        row = latest.get(q)
        hist = (
            f"latest r{row[0]} {'green' if row[1] else 'RED'}"
            if row
            else "no driver row"
        )
        print(f"{i + 1:4d}  {q:42s} {cls_names[key[0]]:13s} {hist}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
