package graft.tools

import java.nio.file.{Files, Paths}

/** Second-JVM half of CrossProcessCommitSpec: exercises the
  * cross-process commit protocol's filesystem primitives from a SEPARATE
  * process (JDK-only — the protocol is pure NIO, so the racing process
  * needs no Spark).
  *
  * Modes:
  *   - `hold <metadataPath> <millis>`: claim the version (create
  *     `<metadataPath>.claim` O_EXCL), hold it for `millis`, release.
  *     Prints CLAIMED / RELEASED; exits 17 if the claim is already held.
  *   - `publish <metadataPath> <fromPath>`: atomically publish the bytes
  *     of `fromPath` as `metadataPath` via tmp + createLink — the other
  *     engine process's winning commit. Exits 17 on conflict.
  */
object CrossProcessCommit {
  def main(args: Array[String]): Unit = args.toList match {
    case "hold" :: mp :: millis :: Nil =>
      val claim = Paths.get(mp + ".claim")
      Files.createDirectories(claim.getParent)
      try Files.createFile(claim)
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        System.err.println(s"claim already held: $claim"); sys.exit(17) }
      // record the holder pid exactly like the engine's withVersionClaim
      // — the dead-holder reclaim path keys on it
      Files.writeString(claim, s"pid=${ProcessHandle.current().pid()}\n")
      println("CLAIMED")
      Console.out.flush()
      Thread.sleep(millis.toLong)
      Files.deleteIfExists(claim)
      println("RELEASED")
    case "publish" :: mp :: from :: Nil =>
      val target = Paths.get(mp)
      Files.createDirectories(target.getParent)
      val tmp = Files.createTempFile(target.getParent, ".commit-", ".tmp")
      try {
        Files.write(tmp, Files.readAllBytes(Paths.get(from)))
        try Files.createLink(target, tmp)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          System.err.println(s"conflict: $target exists"); sys.exit(17) }
      } finally Files.deleteIfExists(tmp)
      println("PUBLISHED")
    case other =>
      System.err.println(s"usage: hold <mp> <ms> | publish <mp> <from>; got $other")
      sys.exit(2)
  }
}
