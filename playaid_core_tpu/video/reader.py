"""Streaming video decode.

The reference seeks the container for every frame
(``input_video.set(CAP_PROP_POS_FRAMES, i)`` inside the render hot loop,
reference: manuscript.py:154), which forces a keyframe seek + re-decode per
frame and was its dominant cost.  This reader decodes *sequentially*, only
seeking on random access, and overlaps decode with downstream work through
a background prefetch thread with a bounded queue.
"""

from __future__ import annotations

import queue
import threading

import cv2


class VideoReader:
    """Sequential-first frame reader over OpenCV.

    ``read_at(i)`` returns frame i, decoding forward without seeking when
    i is at or after the current position (the common case of a frame
    loop), and seeking only when jumping backwards or far ahead.
    """

    # Decoding forward this many frames is cheaper than a container seek.
    MAX_FORWARD_DECODE = 64

    def __init__(self, path):
        self.path = path
        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise IOError(f"Could not open video: {path}")
        self.fps = self.cap.get(cv2.CAP_PROP_FPS)
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.frame_count = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self._pos = 0

    def read_at(self, index):
        """Return (ok, BGR frame) for frame ``index``."""
        if index < self._pos or index > self._pos + self.MAX_FORWARD_DECODE:
            self.cap.set(cv2.CAP_PROP_POS_FRAMES, index)
            self._pos = index
        while self._pos < index:
            ok = self.cap.grab()
            if not ok:
                return False, None
            self._pos += 1
        ok, frame = self.cap.read()
        if ok:
            self._pos += 1
        return ok, frame

    def __iter__(self):
        return self.iter_frames()

    def iter_frames(self, start=0, stop=None):
        """Yield (index, BGR frame) sequentially."""
        if start != self._pos:
            self.cap.set(cv2.CAP_PROP_POS_FRAMES, start)
            self._pos = start
        i = start
        while stop is None or i < stop:
            ok, frame = self.cap.read()
            if not ok:
                return
            self._pos = i + 1
            yield i, frame
            i += 1

    def release(self):
        self.cap.release()


class PrefetchingReader:
    """Background-thread decode with a bounded frame queue, so the consumer
    (annotation / device staging) overlaps with decode."""

    def __init__(self, path, start=0, stop=None, queue_size=32, transform=None):
        self.reader = VideoReader(path)
        self.fps = self.reader.fps
        self.width = self.reader.width
        self.height = self.reader.height
        self.frame_count = self.reader.frame_count
        self._queue: queue.Queue = queue.Queue(maxsize=queue_size)
        self._transform = transform
        self._start = start
        self._stop = stop
        self._stopped = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _producer(self):
        try:
            for i, frame in self.reader.iter_frames(self._start, self._stop):
                if self._stopped.is_set():
                    return
                if self._transform is not None:
                    frame = self._transform(frame)
                # Bounded put with a timeout so a consumer that stopped
                # early never leaves this thread blocked forever.
                while not self._stopped.is_set():
                    try:
                        self._queue.put((i, frame), timeout=0.2)
                        break
                    except queue.Full:
                        continue
        finally:
            try:
                self._queue.put_nowait(None)
            except queue.Full:
                pass

    def __iter__(self):
        while True:
            item = self._queue.get()
            if item is None:
                return
            yield item

    def release(self):
        """Signal the producer, wait for it to exit, then close the
        capture (closing it mid-read is undefined behavior in OpenCV)."""
        self._stopped.set()
        # Drain so a blocked put can complete.
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)
        self.reader.release()
