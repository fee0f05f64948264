"""Analysis PTN formatting parity (alpha-tak/src/analysis.rs:256-282)."""

from tak_tpu.analysis import Analysis, MoveInfo


def test_start_as_black():
    analysis = Analysis(6, 4, start_ply=5)
    analysis.add_move(
        "Se4",
        MoveInfo(mov="Se4", visits=0, reward=-1.0, policy=1.0),
        0.0,
    )
    analysis.add_move_without_info("c6")
    analysis.add_move_without_info("e4+")
    assert str(analysis) == (
        '[Size "6"]\n[Komi "2"]\n'
        "3. -- Se4 {r: +1.000, p: 1.0000, v: 0}\n"
        "4. c6 e4+\n"
    )


def test_marks_and_eval_comments():
    from tak_tpu.analysis import NodeDebugInfo

    a = Analysis(6, 4)
    a.update(NodeDebugInfo([MoveInfo("a1", 100, 0.1, 0.5)]), "a1")
    # big swing: -(eval + prev) = -(0.8 + 0.1) = -0.9 -> blunder on ply 0
    a.update(NodeDebugInfo([MoveInfo("f6", 90, 0.8, 0.4)]), "f6")
    text = str(a)
    assert "a1??" in text
    assert "{evaluation: -0.800}" in text  # white's move shows -next_eval


def test_graph_py_regex_contract():
    import re

    a = Analysis(6, 4)
    a.add_move("a1", MoveInfo("a1", 10, 0.0, 0.1), 0.123)
    a.add_move("f6", MoveInfo("f6", 10, 0.0, 0.1), -0.456)
    a.add_move("b2", MoveInfo("b2", 10, 0.0, 0.1), 0.789)
    evals = re.findall(r"{evaluation: ([+-]\d.\d*)}", str(a))
    assert len(evals) == 2  # first eval consumed, as upstream
    assert evals[0] == "+0.456"
