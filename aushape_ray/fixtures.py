"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Generates the BASELINE.json `input_hint` table shape —
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us]) — with every structural case the reference's collector
framework exercises (execve splits lib/execve_coll.c:431-577, out-of-order
path items lib/path_coll.c:143-157, repeated-kind arrays lib/rep_coll.c,
illegal unique repeats lib/uniq_coll.c:151-153, droppable EOE markers
lib/drop_coll.c:32-34, oversized/hot conversations README.md:203-208,
unicode escapes lib/gbuf.c:282-413).

Seeded; no wall-clock; safe to call from multiple processes (atomic
write-then-rename cache under /tmp/aushape_transcripts).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00 UTC in microseconds

# scale name -> number of conversations (FIXTURES.md scales table)
SCALES = {"tiny": 100, "small": 5_000, "bench": 150_000}
SF_TO_SCALE = {"sf0.001": "tiny", "sf0.01": "small", "sf0.1": "bench"}

CACHE_ROOT = "/tmp/aushape_transcripts"

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu".split()
)
_UNICODE_BITS = ['quote:"', "back\\slash", "newline\nhere", "émigré", "日本語", "tab\there", "ctrl\x01chr"]
_TOOLS = ("shell", "python", "browser", "search", "editor", "reader")
_CMDS = ("ls", "cat", "grep", "curl", "make", "tar")


def _prefix(rng: np.random.Generator, unicode_heavy: bool = False) -> str:
    n = int(rng.integers(1, 4))
    ws = [str(_WORDS[int(i)]) for i in rng.integers(0, len(_WORDS), n)]
    if unicode_heavy:
        ws.append(_UNICODE_BITS[int(rng.integers(0, len(_UNICODE_BITS)))])
    return " ".join(ws)


def _msg_turn(rng, node, role):
    p = _prefix(rng)
    return role, "", f"node={node} type=MSG {p} len={len(p)} lang=en words={len(p.split())}"


def _unique_turn(rng, node, kind):
    uid = int(rng.integers(0, 50)) * 100
    sc = ["0", "1", "2", "59", "42", "999"][int(rng.integers(0, 6))]
    ex = ["0", "0", "-13", "-2"][int(rng.integers(0, 4))]
    extra = {
        "LOGIN": f"uid={uid} success=yes exit={ex}",
        "SUMMARY": f"items={int(rng.integers(1, 9))} score=high",
        "CONFIG": f'key="max size" old=1 new=2',
        "SYSCALL": (
            f"syscall={sc} uid={uid} gid={uid + 1} exit={ex} "
            f"proctitle={(_CMDS[int(rng.integers(0, len(_CMDS)))] + ' --verbose').encode().hex()}"
        ),
        "CWD": f'cwd="/home/user_{uid}"',
    }[kind]
    return "system", "", f"node={node} type={kind} {_prefix(rng)} {extra}"


def _rep_turn(rng, node, kind):
    extra = {
        "AVC": f'deny={int(rng.integers(1, 99))} scontext="sys u" perm=read',
        "OBJ_PID": f"opid={int(rng.integers(100, 9999))} ocomm={_CMDS[int(rng.integers(0, len(_CMDS)))]}",
        "NETFILTER_CFG": f"table=filter family={int(rng.integers(1, 11))} entries={int(rng.integers(0, 40))}",
    }[kind]
    return "tool", _TOOLS[int(rng.integers(0, len(_TOOLS)))], f"node={node} type={kind} {_prefix(rng)} {extra}"


def _execve_turns(rng, node, invalid: str | None):
    """EXECVE argv split across turns (whole args + hex slices).

    invalid: None | 'len_mismatch' | 'idx_overflow'
    """
    argc = int(rng.integers(2, 6))
    turns = [("tool", "shell", f'node={node} type=EXECVE {_prefix(rng)} argc={argc} a0="{_CMDS[int(rng.integers(0, len(_CMDS)))]}"')]
    for i in range(1, argc):
        style = 2 if (invalid == "len_mismatch" and i == 1) else int(rng.integers(0, 3))
        if style == 0:
            turns.append(("tool", "shell", f'node={node} type=EXECVE a{i}="--opt-{i}"'))
        elif style == 1:
            turns.append(("tool", "shell", f"node={node} type=EXECVE a{i}="))  # skipped arg -> ""
        else:  # sliced hex arg across 2 turns
            val = f"value-{int(rng.integers(0, 999))}-long"
            h = val.encode().hex()
            cut = 2 * (len(val) // 2)
            declared = len(val)
            if invalid == "len_mismatch":
                declared += 3
                invalid = None  # inject once
            turns.append(("tool", "shell", f"node={node} type=EXECVE a{i}_len={declared} a{i}[0]={h[:cut]}"))
            turns.append(("tool", "shell", f"node={node} type=EXECVE a{i}[1]={h[cut:]}"))
    if invalid == "idx_overflow":
        turns.append(("tool", "shell", f'node={node} type=EXECVE a{argc + 2}="oops"'))
    return turns


def _path_turns(rng, node, invalid: str | None):
    n = int(rng.integers(2, 6))
    items = list(range(n))
    if invalid == "gap":
        items[-1] = n + 1  # hole at n-1
    rng.shuffle(items)
    if invalid == "dup":
        items[0] = items[-1]
    out = []
    for it in items:
        out.append(("tool", "reader", f'node={node} type=PATH {_prefix(rng)} item={it} name="/srv/f{it}.dat" mode=0644'))
    return out


def generate_transcripts(n_convs: int, seed: int = SEED) -> pa.Table:
    """Build the transcript table for `n_convs` conversations."""
    rng = np.random.default_rng(seed)
    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    ts_us: list[int] = []

    for c in range(n_convs):
        cid = f"c{c:07d}"
        node = f"host{int(rng.integers(0, 16))}"
        r = rng.random()
        turns: list[tuple[str, str, str]] = []
        if r < 0.70:  # plain dialog conversation
            n = int(rng.integers(2, 12))
            used_uniques: list[str] = []
            for t in range(n):
                kr = rng.random()
                if kr < 0.62:
                    role = "user" if t % 2 == 0 else "assistant"
                    turns.append(_msg_turn(rng, node, role))
                elif kr < 0.80:
                    cand = ["LOGIN", "SUMMARY", "CONFIG", "SYSCALL", "CWD"]
                    avail = [k for k in cand if k not in used_uniques]
                    if avail:
                        k = avail[int(rng.integers(0, len(avail)))]
                        used_uniques.append(k)
                        turns.append(_unique_turn(rng, node, k))
                    else:
                        turns.append(_msg_turn(rng, node, "assistant"))
                else:
                    k = ("AVC", "OBJ_PID", "NETFILTER_CFG")[int(rng.integers(0, 3))]
                    turns.append(_rep_turn(rng, node, k))
        elif r < 0.78:  # valid execve
            turns = [_msg_turn(rng, node, "user")] + _execve_turns(rng, node, None)
        elif r < 0.80:  # invalid execve
            kind = "len_mismatch" if rng.random() < 0.5 else "idx_overflow"
            turns = [_msg_turn(rng, node, "user")] + _execve_turns(rng, node, kind)
        elif r < 0.86:  # valid path (permuted items)
            turns = [_msg_turn(rng, node, "user")] + _path_turns(rng, node, None)
        elif r < 0.88:  # invalid path
            turns = [_msg_turn(rng, node, "user")] + _path_turns(rng, node, "gap" if rng.random() < 0.75 else "dup")
        elif r < 0.92:  # rep-heavy
            k = ("AVC", "OBJ_PID", "NETFILTER_CFG")[int(rng.integers(0, 3))]
            turns = [_rep_turn(rng, node, k) for _ in range(int(rng.integers(3, 8)))]
        elif r < 0.94:  # illegal unique repeat -> error event
            k = ("LOGIN", "SUMMARY", "SYSCALL")[int(rng.integers(0, 3))]
            turns = [_msg_turn(rng, node, "user"), _unique_turn(rng, node, k), _unique_turn(rng, node, k)]
        elif r < 0.97:  # EOE-only conversation -> no event (drop-empty rule)
            turns = [("system", "", f"node={node} type=EOE")
                     for _ in range(int(rng.integers(1, 3)))]
        elif r < 0.99:  # unicode / escape heavy dialog
            n = int(rng.integers(2, 6))
            for t in range(n):
                p = _prefix(rng, unicode_heavy=True)
                role = "user" if t % 2 == 0 else "assistant"
                turns.append((role, "", f"node={node} type=MSG {p} len={len(p)}"))
        else:  # hot conversation (skew) / oversized text
            if rng.random() < 0.5:
                n = int(rng.integers(80, 160))  # >=10x median turn count
                for t in range(n):
                    turns.append(_msg_turn(rng, node, "user" if t % 2 == 0 else "assistant"))
            else:
                big = "x" * (1 << 18)  # 256 KiB single text (trim exercise)
                turns = [("assistant", "", f"node={node} type=MSG {big} len={len(big)}")]
        # often terminate with an EOE marker turn (dropped from data, kept in text)
        if r >= 0.97 or r < 0.70 and rng.random() < 0.3:
            if not (0.94 <= r < 0.97):
                turns.append(("system", "", f"node={node} type=EOE"))

        base = BASE_TS_US + c * 60_000_000
        for t, (role, tool, text) in enumerate(turns):
            conv_ids.append(cid)
            turn_idxs.append(t)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            ts_us.append(base + t * 1_000_000 + int(rng.integers(0, 1000)) * 1000)

    return pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(ts_us, pa.timestamp("us")),
    })


# files per scale: sharded input so the read parallelizes (one read task
# per file) and a rerun can skip finished shards — the resumable-input
# layout the 100 TB deployment would use.
SCALE_FILES = {"tiny": 2, "small": 8, "bench": 64}


def transcripts_path(sf_dir: str) -> str:
    """Cache DIRECTORY of the generated transcript shards for a testdata dir."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    scale = SF_TO_SCALE.get(tag, "small")
    return os.path.join(CACHE_ROOT, tag, f"transcripts_{scale}")


def transcripts_glob(sf_dir: str) -> str:
    """Glob form for DuckDB read_parquet()."""
    return transcripts_path(sf_dir) + "/*.parquet"


def write_shards(table: pa.Table, path: str, n_files: int) -> str:
    """Atomically write `table` as conversation-contiguous shards under
    `path` (split points never cut a conversation)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = tempfile.mkdtemp(dir=os.path.dirname(path) or ".")
    conv = table.column("conv_id").to_pylist()
    n = len(conv)
    cuts = [0]
    for i in range(1, n_files):
        j = (n * i) // n_files
        while j < n and conv[j] == conv[j - 1]:
            j += 1
        cuts.append(j)
    cuts.append(n)
    for i in range(n_files):
        if cuts[i + 1] > cuts[i]:
            pq.write_table(table.slice(cuts[i], cuts[i + 1] - cuts[i]),
                           os.path.join(tmp, f"part-{i:05d}.parquet"),
                           row_group_size=16_384)
    try:
        os.replace(tmp, path)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)  # someone else won the race
    return path


def ensure_transcripts(sf_dir: str) -> str:
    """Generate (once, atomically) and return the transcript shard dir."""
    path = transcripts_path(sf_dir)
    if os.path.isdir(path):
        return path
    tag = os.path.basename(os.path.normpath(sf_dir))
    scale = SF_TO_SCALE.get(tag, "small")
    table = generate_transcripts(SCALES[scale])
    return write_shards(table, path, SCALE_FILES[scale])
