"""Regenerate orama_spark/kernel/_serbian_data.py from the reference's
compiled rs.js (the among tables are the PUBLIC serbian.sbl data).

    python tools/gen_serbian_data.py
"""
import re

SRC = "/root/reference/packages/stemmers/lib/rs.js"
OUT = "orama_spark/kernel/_serbian_data.py"
src = open(SRC).read()


def grab_table(name):
    m = re.search(r"\n    " + name + r" = \[([\s\S]*?)\n    \],?\n", src)
    rows = re.findall(
        r"\['((?:\\u[0-9a-f]{4}|[^'])*)',\s*(-?\d+),\s*(-?\d+)\]", m.group(1))
    return [(r[0].encode().decode("unicode_escape"), int(r[1]), int(r[2]))
            for r in rows]


def grab_switch(body):
    actions = {}
    pat = (r"case (\d+):\s*\n\s*(?:if \(!(r \|\| )?!?c\.b\('"
           r"((?:\\u[0-9a-f]{4}|[^'])*)'\)\)|(!r \|\| )?c\.b\('"
           r"((?:\\u[0-9a-f]{4}|[^'])*)'\))")
    for m in re.finditer(pat, body):
        rep = m.group(3) if m.group(3) is not None else m.group(5)
        actions[int(m.group(1))] = (
            rep.encode().decode("unicode_escape"),
            bool(m.group(2) or m.group(4)),
        )
    return actions


d_tab, n_tab, v_tab = grab_table("d"), grab_table("n"), grab_table("v")
n_act = grab_switch(src[src.index("function h()"):src.index("var c = new C()")])
d_act = grab_switch(src[src.index("this.l = function"):])
assert not {r for _, _, r in n_tab if r > 0 and r not in n_act}
assert not {r for _, _, r in d_tab if r > 0 and r not in d_act}

with open(OUT, "w") as f:
    f.write('"""Serbian stemmer among tables + case actions, generated from the\n'
            "PUBLIC serbian.sbl among data (via the reference's compiled\n"
            "lib/rs.js) by tools/gen_serbian_data.py. DO NOT EDIT BY HAND.\n\n"
            "Rows are (suffix, substring_link, case); ACTIONS map case ->\n"
            '(replacement, only_when_no_diacritics).\n"""\n\n')
    for name, tab in (("STEP1_TABLE", d_tab), ("STEP2_TABLE", n_tab),
                      ("STEP3_TABLE", v_tab)):
        f.write(f"{name} = [\n")
        for s, sub, res in tab:
            f.write(f"    ({s!r}, {sub}, {res}),\n")
        f.write("]\n\n")
    for name, act in (("STEP1_ACTIONS", d_act), ("STEP2_ACTIONS", n_act)):
        f.write(f"{name} = {{\n")
        for case in sorted(act):
            rep, gated = act[case]
            f.write(f"    {case}: ({rep!r}, {gated}),\n")
        f.write("}\n")
print("regenerated", OUT)
