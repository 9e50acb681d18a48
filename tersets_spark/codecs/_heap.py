"""Hashed binary min-heap — semantic mirror of the reference's priority queue.

Reproduces the observable behavior of ``HashedPriorityQueue``
(/root/reference/src/utilities/hashed_priority_queue.zig:46-252): a binary
min-heap plus a key->position map for O(1) keyed lookup and O(log n) keyed
update. Elements are arbitrary objects; ``key(elem)`` plays the role of the
reference's HashContext (hash/eql by the element's ``index`` field in every
call site), and ``compare(a, b) -> -1|0|+1`` plays the role of ``compareFn``.

Faithfully reproduced quirks that affect which element pops first (and thus
the compressed output of PWCH/PWLH/VW/BottomUp):

* ``update`` re-sifts only when ``compare(new, old)`` is non-zero (zig
  :154-158). The histogram codec's comparator returns *equal* whenever the two
  indices match (histogram_compression.zig:293-297), so updating a merge error
  in place never re-heapifies — the heap may transiently violate the heap
  property, exactly as in the reference.
* ``siftUp`` stops on ``compare != lt`` (zig :203) and ``siftDown`` keeps
  descending past *equal* children (zig :229), so tie ordering matches.
* The key map is a plain overwrite-on-put dict, so "logically removed"
  entries that share the sentinel key (histogram_compression.zig:502-511)
  clobber each other's positions exactly as the reference's HashMap does.
"""

from __future__ import annotations

from ..errors import EmptyQueueError, ItemNotFoundError


class HashedHeap:
    __slots__ = ("items", "index_map", "compare", "key")

    def __init__(self, compare, key):
        self.items: list = []
        self.index_map: dict = {}
        self.compare = compare
        self.key = key

    def __len__(self) -> int:
        return len(self.items)

    def add(self, elem) -> None:
        self.items.append(elem)
        self.index_map[self.key(elem)] = len(self.items) - 1
        self._sift_up(len(self.items) - 1)

    def peek(self):
        if not self.items:
            raise EmptyQueueError("empty queue")
        return self.items[0]

    def pop(self):
        return self.remove_index(0)

    def remove_index(self, index: int):
        if index >= len(self.items):
            raise ItemNotFoundError("heap index out of range")
        item = self.items[index]
        last = self.items.pop()
        if index < len(self.items):
            self.items[index] = last
            if index == 0:
                self._sift_down(index)
            else:
                parent = self.items[(index - 1) >> 1]
                if self.compare(last, parent) > 0:
                    self._sift_down(index)
                else:
                    self._sift_up(index)
        self.index_map.pop(self.key(item), None)
        return item

    def update(self, elem, new_elem) -> None:
        pos = self.index_map.get(self.key(elem))
        if pos is None:
            raise ItemNotFoundError("element not in queue")
        old_elem = self.items[pos]
        self.index_map.pop(self.key(elem), None)
        self.index_map[self.key(new_elem)] = pos
        self.items[pos] = new_elem
        order = self.compare(new_elem, old_elem)
        if order < 0:
            self._sift_up(pos)
        elif order > 0:
            self._sift_down(pos)

    def get_index(self, elem) -> int:
        pos = self.index_map.get(self.key(elem))
        if pos is None:
            raise ItemNotFoundError("element not in queue")
        return pos

    def get(self, index: int):
        if index >= len(self.items):
            raise ItemNotFoundError("heap index out of range")
        return self.items[index]

    def _sift_up(self, start: int) -> None:
        items, compare, key, index_map = self.items, self.compare, self.key, self.index_map
        child = items[start]
        child_index = start
        while child_index > 0:
            parent_index = (child_index - 1) >> 1
            parent = items[parent_index]
            if compare(child, parent) >= 0:  # zig :203 — break unless child < parent
                break
            items[child_index] = parent
            index_map[key(parent)] = child_index
            child_index = parent_index
        items[child_index] = child
        index_map[key(child)] = child_index

    def _sift_down(self, start: int) -> None:
        items, compare, key, index_map = self.items, self.compare, self.key, self.index_map
        n = len(items)
        target = items[start]
        index = start
        while True:
            lesser = (index * 2) | 1
            if lesser >= n:
                break
            nxt = lesser + 1
            if nxt < n and compare(items[nxt], items[lesser]) < 0:
                lesser = nxt
            if compare(target, items[lesser]) < 0:  # zig :229 — equal keeps sinking
                break
            items[index] = items[lesser]
            index_map[key(items[index])] = index
            index = lesser
        items[index] = target
        index_map[key(target)] = index
