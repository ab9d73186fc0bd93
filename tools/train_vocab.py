"""Offline vocabulary training (the analog of shipping ORBvoc.txt).

Renders textured PlaneScene views from several scenes/viewpoints,
extracts production ORB descriptors, runs batched binary k-means with
corpus IDF (worldmap.vocabulary.train_vocabulary), evaluates retrieval
precision under viewpoint change against the random vocabulary, and
writes orb_slam2_annotate_tpu/worldmap/trained_vocab.npz (picked up
automatically by LoopCloser._default_vocabulary).

Usage: python tools/train_vocab.py [--words 4096] [--views 40]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def collect_descriptors(n_scenes: int, n_views: int, n_features: int = 512,
                        n_levels: int = 4):
    from orb_slam2_annotate_tpu.geometry import CameraModel
    from orb_slam2_annotate_tpu.io import synthetic
    from orb_slam2_annotate_tpu.ops.extractor import ExtractorConfig, extract

    cam = CameraModel.create(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                             width=320, height=240)
    ecfg = ExtractorConfig(n_features=n_features, n_levels=n_levels)
    rng = np.random.RandomState(0)

    descs, docs = [], []
    doc = 0
    makers = (lambda sd: synthetic.PlaneScene(seed=sd),
              lambda sd: synthetic.StructuredScene(seed=sd),
              lambda sd: synthetic.BlobScene(seed=sd))
    for s in range(n_scenes):
        scene = makers[s % 3](s)
        for v in range(n_views):
            # random small pose inside the room
            phi = rng.uniform(-0.15, 0.15, 3)
            ct, st = np.cos(phi), np.sin(phi)
            Rx = np.array([[1, 0, 0], [0, ct[0], -st[0]], [0, st[0], ct[0]]])
            Ry = np.array([[ct[1], 0, st[1]], [0, 1, 0], [-st[1], 0, ct[1]]])
            R = (Ry @ Rx).astype(np.float32)
            t = rng.uniform([-1.2, -0.6, -0.8], [1.2, 0.6, 0.8]).astype(np.float32)
            img, _ = scene.render(cam, R, t, h=240, w=320)
            f = extract(jnp.asarray(img.astype(np.float32)), ecfg)
            val = np.asarray(f.valid)
            descs.append(np.asarray(f.desc)[val])
            docs.append(np.full(int(val.sum()), doc, np.int64))
            doc += 1
    return np.concatenate(descs), np.concatenate(docs)


def retrieval_precision(vocab, cam, n_queries: int = 24,
                        n_features: int = 512, n_levels: int = 4) -> float:
    """Same-place-vs-other-place top-1 retrieval under viewpoint change."""
    from orb_slam2_annotate_tpu.io import synthetic
    from orb_slam2_annotate_tpu.ops.extractor import ExtractorConfig, extract
    from orb_slam2_annotate_tpu.worldmap import vocabulary as voc

    ecfg = ExtractorConfig(n_features=n_features, n_levels=n_levels)
    rng = np.random.RandomState(7)
    scene = synthetic.PlaneScene(seed=99)

    # database: 12 distinct "places" (poses); queries: perturbed revisits
    places = []
    for i in range(12):
        t = rng.uniform([-1.5, -0.6, -0.8], [1.5, 0.6, 0.8]).astype(np.float32)
        places.append((np.eye(3, dtype=np.float32), t))
    bows = []
    for R, t in places:
        img, _ = scene.render(cam, R, t, h=240, w=320)
        f = extract(jnp.asarray(img.astype(np.float32)), ecfg)
        bows.append(voc.bow_vector(vocab, f.desc, f.valid))
    bows = jnp.stack(bows)

    hits = 0
    for q in range(n_queries):
        pi = rng.randint(len(places))
        R, t = places[pi]
        dt = rng.uniform(-0.12, 0.12, 3).astype(np.float32)
        a = rng.uniform(-0.06, 0.06)
        ca, sa = np.cos(a), np.sin(a)
        Rq = (np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]],
                       np.float32) @ R)
        img, _ = scene.render(cam, Rq, t + dt, h=240, w=320)
        f = extract(jnp.asarray(img.astype(np.float32)), ecfg)
        bq = voc.bow_vector(vocab, f.desc, f.valid)
        s = voc.l1_scores(bows, bq)
        hits += int(int(jnp.argmax(s)) == pi)
    return hits / n_queries


def main():
    from orb_slam2_annotate_tpu.geometry import CameraModel
    from orb_slam2_annotate_tpu.worldmap import vocabulary as voc

    ap = argparse.ArgumentParser()
    ap.add_argument("--words", type=int, default=4096)
    ap.add_argument("--scenes", type=int, default=6)
    ap.add_argument("--views", type=int, default=24)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--features", type=int, default=512)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(voc.__file__), "trained_vocab.npz"))
    args = ap.parse_args()

    t0 = time.time()
    descs, docs = collect_descriptors(args.scenes, args.views,
                                      args.features, args.levels)
    print(f"collected {len(descs)} descriptors from {docs.max()+1} views "
          f"({time.time()-t0:.1f}s)")

    t0 = time.time()
    vocab = voc.train_vocabulary(descs, args.words, iters=args.iters,
                                 doc_ids=docs)
    print(f"trained {args.words} words ({time.time()-t0:.1f}s); "
          f"idf range [{float(vocab.idf.min()):.2f}, "
          f"{float(vocab.idf.max()):.2f}]")

    cam = CameraModel.create(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                             width=320, height=240)
    p_rand = retrieval_precision(voc.make_vocabulary(args.words), cam,
                                 n_features=args.features,
                                 n_levels=args.levels)
    p_train = retrieval_precision(vocab, cam,
                                  n_features=args.features,
                                  n_levels=args.levels)
    print(f"retrieval precision@1 under viewpoint change: "
          f"random={p_rand:.2f} trained={p_train:.2f}")

    voc.save_vocabulary(args.out, vocab)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
