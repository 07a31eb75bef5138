package graft.core

/** Solidity storage-slot → MPT-key derivation (reference:
  * `mrp2-utils/src/storage_key.rs:108-270`, `eth.rs:247-285`).
  * Public layout rules from the Solidity storage spec:
  *   mapping entry location = keccak(pad32(key) ‖ pad32(slot))
  *   simple slot location   = pad32(slot)
  *   MPT key                = keccak(location)
  */
object StorageKey {

  /** `MappingSlot::mpt_key` (storage_key.rs:200-270) */
  def mappingLocation(mappingKey: Array[Byte], slot: Int): Array[Byte] =
    Keccak.keccak256(Bytes.concat(Bytes.leftPad32(mappingKey), Bytes.leftPad32(Bytes.beBytes(slot.toLong, 4))))

  def mappingMptKey(mappingKey: Array[Byte], slot: Int): Array[Byte] =
    Keccak.keccak256(mappingLocation(mappingKey, slot))

  /** `SimpleSlot::mpt_key` (storage_key.rs:108-199) */
  def simpleSlotMptKey(slot: Int): Array[Byte] =
    Keccak.keccak256(Bytes.leftPad32(Bytes.beBytes(slot.toLong, 4)))
}
