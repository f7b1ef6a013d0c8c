"""Multitrack model fuzz: random edit sequences against structural
invariants — the audio transition state machine must stay well-formed
through any interleaving of inserts (all modes/gravities), moves, trims,
deletes, gaps, splits, audio blocks and undo/redo (multitrack.c's edit
handlers never corrupt the event list; neither may ours)."""

import random

import numpy as np
import pytest

from lives_tpu.events.event_list import EventType
from lives_tpu.multitrack import Gravity, InsertMode, Multitrack


def check_invariants(mt: Multitrack):
    # frame events sorted, indexed, grids well-formed
    evs = mt.el.frame_events()
    tcs = [e.tc for e in evs]
    assert tcs == sorted(tcs)
    for e in evs:
        assert len(e.props["clips"]) == len(e.props["frames"])
        ac = e.props.get("audio_clips", [])
        asx = e.props.get("audio_seeks", [])
        assert len(ac) % 2 == 0, f"odd audio_clips {ac}"
        assert len(asx) == len(ac), (ac, asx)
        tracks_seen = [ac[i] for i in range(0, len(ac), 2)]
        assert len(set(tracks_seen)) == len(tracks_seen), \
            f"duplicate track entries {ac}"
    # video blocks never overlap per track
    for t in range(mt.n_tracks):
        last = -1
        for b in sorted(mt.blocks(t), key=lambda b: b.start):
            assert b.length > 0
            assert b.start >= last, f"overlap on track {t}"
            last = b.end
    # audio block views derive cleanly on every track
    for t in range(-mt.n_audio_tracks, mt.n_tracks):
        for ab in mt.audio_blocks(t):
            assert ab.length > 0
    # the index agrees with a fresh reindex
    ids = [e.event_id for e in mt.el.events]
    mt.el.reindex()
    assert [e.event_id for e in mt.el.events] == ids


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_fuzz_edit_sequences(seed):
    rng = random.Random(seed)
    mt = Multitrack(n_tracks=3, width=32, height=16)
    snapshots = []

    def op_insert():
        mt.gravity = Gravity(rng.choice([0, 1, 2]))
        mt.insert_mode = InsertMode(rng.choice([0, 2, 4]))
        mt.insert_block(rng.randrange(3), rng.randint(1, 4),
                        rng.randrange(60), rng.randint(1, 20),
                        offset=rng.randrange(5),
                        with_audio=rng.random() < 0.7)

    def op_audio_insert():
        mt.insert_audio_block(-1, rng.randint(1, 4), rng.randrange(60),
                              rng.randint(1, 20),
                              seek=rng.uniform(0, 2),
                              vel=rng.choice([1.0, -1.0, 0.5, 2.0]))

    def op_move():
        for t in range(3):
            bs = mt.blocks(t)
            if bs:
                mt.move_block(rng.choice(bs), rng.randrange(3),
                              rng.randrange(60))
                return

    def op_trim():
        for t in range(3):
            bs = [b for b in mt.blocks(t) if b.length > 2]
            if bs:
                b = rng.choice(bs)
                mt.trim_block(b, rng.randint(1, b.length - 1),
                              from_start=rng.random() < 0.5)
                return

    def op_delete():
        for t in range(3):
            bs = mt.blocks(t)
            if bs:
                mt.delete_block(rng.choice(bs))
                return

    def op_adelete():
        abs_ = mt.audio_blocks(-1)
        if abs_:
            mt.delete_audio_block(rng.choice(abs_))

    def op_split():
        for t in range(3):
            bs = [b for b in mt.blocks(t) if b.length > 2]
            if bs:
                b = rng.choice(bs)
                mt.split_block(b, b.start + rng.randint(1, b.length - 1))
                return

    def op_gap():
        if rng.random() < 0.5:
            mt.insert_gap([rng.randrange(3)], rng.randrange(40),
                          rng.randint(1, 8))
        else:
            mt.remove_gaps([rng.randrange(3)], 0, mt.n_frames or 1)

    def op_volume():
        mt.set_track_volume(rng.choice([-1, 0, 1, 2]),
                            rng.uniform(0, 1.2),
                            frame=rng.choice([None, rng.randrange(60)]))

    def op_fx():
        mt.add_effect("negate", [rng.randrange(3)], rng.randrange(40),
                      rng.randint(1, 10))

    def op_undo():
        mt.undo()

    def op_redo():
        mt.redo()

    ops = ([op_insert] * 6 + [op_audio_insert] * 2 + [op_move] * 3
           + [op_trim] * 2 + [op_delete] * 2 + [op_adelete]
           + [op_split] * 2 + [op_gap] * 2 + [op_volume] * 2
           + [op_fx] + [op_undo] * 2 + [op_redo])
    for k in range(120):
        rng.choice(ops)()
        if k % 10 == 9:
            check_invariants(mt)
            snapshots.append(mt.el.to_json())
    # undo walks back through valid states only
    for _ in range(10):
        if not mt.undo():
            break
        check_invariants(mt)
    # the final timeline still mixes audio without error
    class FakeClip:
        arate = 44100

        def read_audio(self):
            return np.full((44100, 2), 0.3, np.float32)
    audio = mt.render_audio({c: FakeClip() for c in range(1, 5)})
    assert np.isfinite(audio).all()


@pytest.mark.parametrize("seed", [9, 13])
def test_fuzz_grid_completeness(seed):
    """Every grid slot below the last frame event has an event after any
    edit sequence (renders must never compress time)."""
    rng = random.Random(seed)
    mt = Multitrack(n_tracks=3, width=32, height=16)
    for k in range(150):
        r = rng.random()
        try:
            if r < 0.3:
                mt.gravity = Gravity(rng.choice([0, 1, 2]))
                mt.insert_mode = InsertMode(rng.choice([0, 2, 4]))
                mt.insert_block(rng.randrange(3), rng.randint(1, 4),
                                rng.randrange(80), rng.randint(1, 20))
            elif r < 0.4:
                mt.insert_audio_block(-1, rng.randint(1, 4),
                                      rng.randrange(80),
                                      rng.randint(1, 20))
            elif r < 0.5:
                bs = mt.blocks(rng.randrange(3))
                if bs:
                    mt.move_block(rng.choice(bs), rng.randrange(3),
                                  rng.randrange(80))
            elif r < 0.6:
                bs = mt.blocks(rng.randrange(3))
                if bs:
                    mt.delete_block(rng.choice(bs))
            elif r < 0.7:
                mt.insert_gap([rng.randrange(3)], rng.randrange(40),
                              rng.randint(1, 8))
            elif r < 0.8:
                mt.remove_gaps([rng.randrange(3)], 0, mt.n_frames or 1)
            elif r < 0.9:
                mt.undo()
            else:
                mt.redo()
        except ValueError:
            pass
        evs = {mt.tc_frame(e.tc) for e in mt.el.frame_events()}
        if evs:
            top = max(evs)
            missing = set(range(top)) - evs
            assert not missing, (k, sorted(missing)[:10])
